"""M0 — deterministic synthetic change-log generator + batch oracle.

Produces the FIXTURES.md §1 `changelog` fixture: a binlog/WAL-style change
feed over an entity table of source-code repositories with columns
(repo, path, commit, lang, content) — one row per I/U/D event, delivered
out of order within a bounded window, with optional duplicate delivery,
one hot repo (skew), and an optional additive schema-evolution flip
(schema_ver 1 -> 2 adds nullable size_bytes:long).

Everything is derived from (seed, n_events) with numpy — no wall clock,
no RNG state leakage — so the same call always produces byte-identical
segments and the oracle is independently recomputable.

Reference parity note: the reference tree is empty (SURVEY.md §0); the
fixture shape is mandated by BASELINE.json:6,15 (envelope + entity schema).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = np.array(["py", "js", "go", "java", "md"])

#: envelope columns, in on-disk order (schema_ver 1)
ENVELOPE_COLS = ["op", "seq", "repo", "path", "commit", "lang", "content", "event_ts", "schema_ver"]

BASE_TS = pd.Timestamp("2024-01-01 00:00:00")


@dataclass
class ChangelogSpec:
    n_events: int = 10_000
    n_repos: int = 20
    paths_per_repo: int = 50
    hot_repo_fraction: float = 0.5  # share of events landing on repo_0 (skew fixture)
    op_mix: tuple[float, float, float] = (0.6, 0.3, 0.1)  # I / U / D
    disorder_window: int = 64  # delivery shuffled within +-window positions
    duplicate_fraction: float = 0.0  # fraction of events delivered twice
    evolve_at_fraction: float | None = None  # e.g. 0.5 -> schema_ver=2 (+size_bytes) after
    segment_rows: int = 2_000
    seed: int = 42
    content_tokens_max: int = 24  # content length knob (bench scales this)
    seq_start: int = 1  # first commit sequence (chunked generation offsets this)


@dataclass
class GeneratedChangelog:
    spec: ChangelogSpec
    log_dir: str
    segments: list[str] = field(default_factory=list)
    n_delivered: int = 0  # includes duplicates


def _events_frame(spec: ChangelogSpec) -> pd.DataFrame:
    """All events in commit (seq) order, before delivery shuffling."""
    n = spec.n_events
    rng = np.random.default_rng(spec.seed)
    seq = np.arange(spec.seq_start, spec.seq_start + n, dtype=np.int64)

    # key skew: hot repo_0 gets hot_repo_fraction of events
    hot = rng.random(n) < spec.hot_repo_fraction
    repo_idx = np.where(
        hot, 0, rng.integers(1, max(2, spec.n_repos), size=n, dtype=np.int64)
    )
    path_idx = rng.integers(0, spec.paths_per_repo, size=n, dtype=np.int64)

    p_i, p_u, p_d = spec.op_mix
    r = rng.random(n)
    op = np.where(r < p_i, "I", np.where(r < p_i + p_u, "U", "D"))

    repo = pd.Series(repo_idx).map(lambda i: f"repo_{i:04d}").to_numpy()
    path = pd.Series(path_idx).map(lambda j: f"src/mod_{j:04d}.py").to_numpy()
    # deterministic hex commit id derived from seq (Knuth multiplicative hash)
    commit_ints = (seq * np.int64(-7046029254386353131)).astype(np.uint64)
    commit = pd.Series(commit_ints).map("{:016x}".format).to_numpy()
    lang = LANGS[(seq % len(LANGS)).astype(np.int64)]

    # deterministic pseudo-source content derived from (repo, path, seq)
    filler_counts = (seq % spec.content_tokens_max + 1).astype(np.int64)
    filler = pd.Series(np.full(n, "pass # lorem\n")).str.repeat(filler_counts)
    content = (
        "# " + pd.Series(repo) + "/" + pd.Series(path) + "\n"
        + "def fn_" + pd.Series(seq).astype(str) + "():\n"
        + "    return " + pd.Series(commit_ints % 9973).astype(str) + "\n"
        + filler.reset_index(drop=True)
    ).to_numpy()

    jitter = rng.integers(0, 50, size=n, dtype=np.int64)
    event_ts = BASE_TS + pd.to_timedelta(seq * 100 + jitter, unit="ms")

    df = pd.DataFrame(
        {
            "op": op,
            "seq": seq,
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": content,
            "event_ts": event_ts,
            "schema_ver": np.int32(1),
        }
    )
    if spec.evolve_at_fraction is not None:
        cut = int(n * spec.evolve_at_fraction)
        ver = np.where(seq > cut, 2, 1).astype(np.int32)
        df["schema_ver"] = ver
        size_bytes = pd.Series(content).str.len().astype("int64")
        df["size_bytes"] = size_bytes.where(pd.Series(ver == 2), other=pd.NA).astype("Int64")
    return df


def _delivery_order(spec: ChangelogSpec, n: int) -> np.ndarray:
    """Permutation: out-of-order within +-disorder_window positions."""
    rng = np.random.default_rng(spec.seed + 1)
    keys = np.arange(n, dtype=np.float64) + rng.uniform(
        -spec.disorder_window, spec.disorder_window, size=n
    )
    return np.argsort(keys, kind="stable")


def generate_changelog(
    spec: ChangelogSpec, log_dir: str, segment_start: int = 0
) -> GeneratedChangelog:
    """Write ordered segment files `seg-{i:05d}.parquet` under log_dir."""
    os.makedirs(log_dir, exist_ok=True)
    df = _events_frame(spec)
    order = _delivery_order(spec, len(df))
    delivered = df.iloc[order].reset_index(drop=True)

    if spec.duplicate_fraction > 0:
        rng = np.random.default_rng(spec.seed + 2)
        dup_mask = rng.random(len(delivered)) < spec.duplicate_fraction
        dups = delivered[dup_mask]
        # re-deliver duplicates interleaved shortly after the original
        delivered = (
            pd.concat([delivered, dups], ignore_index=True)
            .sample(frac=1.0, random_state=spec.seed + 3)
            .reset_index(drop=True)
        )

    out = GeneratedChangelog(spec=spec, log_dir=log_dir, n_delivered=len(delivered))
    table = pa.Table.from_pandas(delivered, preserve_index=False)
    n_segs = max(1, -(-len(delivered) // spec.segment_rows))
    for i in range(n_segs):
        lo = i * spec.segment_rows
        hi = min(len(delivered), lo + spec.segment_rows)
        seg_path = os.path.join(log_dir, f"seg-{segment_start + i:05d}.parquet")
        pq.write_table(
            table.slice(lo, hi - lo),
            seg_path,
            compression="snappy",
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        out.segments.append(seg_path)
    return out


def generate_changelog_chunked(
    spec: ChangelogSpec, log_dir: str, chunk_events: int = 2_000_000
) -> GeneratedChangelog:
    """Bench-scale generation: emit the log in independent chunks so driver
    memory stays bounded at 10^8+-event scale. Chunk i draws from
    seed+i with seq offset i*chunk_events — deterministic, globally unique
    increasing seqs, same key/hot-repo distribution in every chunk.
    (Out-of-order delivery and duplicates stay within a chunk; the disorder
    window is orders of magnitude smaller than a chunk, so semantics match
    the single-shot generator.)"""
    out = GeneratedChangelog(spec=spec, log_dir=log_dir)
    seg_start = 0
    done = 0
    chunk_idx = 0
    while done < spec.n_events:
        n = min(chunk_events, spec.n_events - done)
        sub = ChangelogSpec(
            **{
                **spec.__dict__,
                "n_events": n,
                "seed": spec.seed + chunk_idx,
                "seq_start": spec.seq_start + done,
            }
        )
        g = generate_changelog(sub, log_dir, segment_start=seg_start)
        out.segments.extend(g.segments)
        out.n_delivered += g.n_delivered
        seg_start += len(g.segments)
        done += n
        chunk_idx += 1
    return out


def expected_final_state(spec: ChangelogSpec) -> pd.DataFrame:
    """Batch oracle (FIXTURES.md §3): per (repo, path) the payload of the
    max-seq event; keys whose max-seq event is a delete are absent.
    Computed in pandas, independently of the engine."""
    df = _events_frame(spec)
    idx = df.groupby(["repo", "path"])["seq"].idxmax()
    final = df.loc[idx]
    final = final[final["op"] != "D"].drop(columns=["op"]).reset_index(drop=True)
    return final


def expected_final_state_chunked(
    spec: ChangelogSpec, chunk_events: int = 2_000_000
) -> pd.DataFrame:
    """Oracle matching `generate_changelog_chunked`: the generator reseeds
    each chunk (seed+i, seq offset i*chunk_events), so a single-shot
    `expected_final_state(spec)` describes a DIFFERENT event set for
    n_events > chunk_events (ADVICE.md). This mirrors the exact sub-spec
    iteration, concatenates the per-chunk frames, and takes the global
    per-key max-seq argmax."""
    frames = []
    done = 0
    chunk_idx = 0
    while done < spec.n_events:
        n = min(chunk_events, spec.n_events - done)
        sub = ChangelogSpec(
            **{
                **spec.__dict__,
                "n_events": n,
                "seed": spec.seed + chunk_idx,
                "seq_start": spec.seq_start + done,
            }
        )
        frames.append(_events_frame(sub))
        done += n
        chunk_idx += 1
    df = pd.concat(frames, ignore_index=True)
    idx = df.groupby(["repo", "path"])["seq"].idxmax()
    final = df.loc[idx]
    return final[final["op"] != "D"].drop(columns=["op"]).reset_index(drop=True)
