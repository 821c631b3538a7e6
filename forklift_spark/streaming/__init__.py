from .ingest import CHANGELOG_SCHEMA, CHANGELOG_SCHEMA_V2, replay_batch, run_ingest, verify_state

__all__ = [
    "CHANGELOG_SCHEMA",
    "CHANGELOG_SCHEMA_V2",
    "replay_batch",
    "run_ingest",
    "verify_state",
]
