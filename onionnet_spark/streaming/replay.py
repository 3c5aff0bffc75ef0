"""Shared at-least-once replay guard for the foreachBatch
maintainers (r9 VERDICT item 6).

``foreachBatch`` delivers each epoch AT LEAST once: a sink failure
after the merge but before the offset commit redelivers the same
(monotonically increasing) ``batch_id``. Every maintainer whose merge
is a non-idempotent monoid (count/sum unions, signature appends)
would double-count the replayed rows, so each batch entry point
consults this guard first and records the id only AFTER its state
checkpoint succeeded — a merge that died mid-batch must accept the
stream's retry, not skip it. Idempotent merges (pure MAX/MIN keyed
upserts) are safe either way but use the guard too, so redelivery
never even re-runs their Spark jobs.

Contract (r9 ADVICE): the guard is IN-PROCESS and assumes ONE
streaming query per maintainer instance.

- Attaching the same instance to a second query (or restarting a
  query with a fresh checkpoint location) restarts batch_ids at 0,
  which this guard would read as already-applied replays and silently
  skip. Use one maintainer instance per query; call ``reset_replay_
  guard()`` if an instance must be re-armed for a new query whose
  state intentionally carries over.
- A driver restart loses both the guard and the localCheckpoint-ed
  state. The production shape is Delta/Iceberg ``MERGE INTO`` with
  ``txnAppId``/``txnVersion`` (the store-side idempotent commit),
  where the batch_id travels with the write instead of living in
  driver memory.
"""

from __future__ import annotations


class ReplayGuardMixin:
    """Mixin for foreachBatch maintainers: skip-already-applied
    batch_ids. Subclasses call ``_is_replay`` first and
    ``_mark_applied`` only after the merged state is durably
    checkpointed."""

    _last_batch_id: int | None = None

    def _is_replay(self, batch_id: int | None) -> bool:
        """True when `batch_id` was already applied (foreachBatch
        redelivery). None (direct/batch-mode invocation) never counts
        as a replay."""
        return (
            batch_id is not None
            and self._last_batch_id is not None
            and batch_id <= self._last_batch_id
        )

    def _mark_applied(self, batch_id: int | None) -> None:
        """Record `batch_id` as applied. Call AFTER the eager state
        checkpoint: recording before it would make the stream's retry
        of a mid-merge failure a silent skip."""
        if batch_id is not None:
            self._last_batch_id = batch_id

    def reset_replay_guard(self) -> None:
        """Re-arm the guard for a NEW streaming query (fresh
        checkpoint location => batch_ids restart at 0) whose state
        intentionally carries over from this instance."""
        self._last_batch_id = None
