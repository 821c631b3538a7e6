"""Generate (once) the shared change log used by the scaling bench — both
parallelism levels replay the SAME input, as the scaling criterion requires.

  python scripts/gen_scale_log.py --log-dir /tmp/fk_scale/log --n-events 24000000
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forklift_spark.changelog import ChangelogSpec, generate_changelog_chunked


def make_spec(n_events: int, seed: int = 42, content_tokens: int = 96) -> ChangelogSpec:
    """The bench fixture: many repos, one hot repo (skew), duplicates and
    bounded disorder present, ~0.7 KB average content bodies. Segments are
    deliberately small (512 per log → ~64 files per 8-epoch trigger): the
    scan+hash+shuffle-write stage parallelizes per file, so per-epoch file
    count must comfortably exceed the core count or the whole replay is
    capped at file-count-way parallelism (measured: 9 files/epoch pinned
    local[8] and local[32] to identical epoch walls)."""
    return ChangelogSpec(
        n_events=n_events,
        n_repos=max(50, n_events // 20_000),
        paths_per_repo=400,
        hot_repo_fraction=0.2,
        duplicate_fraction=0.02,
        disorder_window=512,
        segment_rows=max(10_000, n_events // 512),
        seed=seed,
        content_tokens_max=content_tokens,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--n-events", type=int, default=24_000_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--content-tokens", type=int, default=96)
    args = ap.parse_args()

    marker = os.path.join(
        args.log_dir, f"_DONE-{args.n_events}-{args.seed}-{args.content_tokens}"
    )
    if os.path.exists(marker):
        print(f"log already generated at {args.log_dir}")
        return
    shutil.rmtree(args.log_dir, ignore_errors=True)
    out = generate_changelog_chunked(
        make_spec(args.n_events, args.seed, args.content_tokens), args.log_dir
    )
    with open(marker, "w") as f:
        f.write("ok")
    print(f"generated {out.n_delivered} delivered events in {len(out.segments)} segments")


if __name__ == "__main__":
    main()
