"""Bounded, state-keyed tracking of persisted DataFrames.

Several operators pin an expensive subtree (tokenize sets, Lloyd
centroid tables, verified pair streams) across invocations. Spark's
CacheManager keys entries on the ANALYZED PLAN, which creates two
session-lifetime hazards this helper centralizes the fix for:

1. Unbounded pinned state: re-calling ``.persist()`` on an equal plan
   only logs the "already cached" WARN and leaves an untracked handle
   nothing ever unpersists — a long-lived session touching many corpora
   accumulates one cache entry per corpus (VERDICT r08 #7). The live
   list here holds ONE handle per DISTINCT plan (``sameSemantics``
   dedup — releasing an alias of the current plan would evict the warm
   entry a re-invocation is about to read) and evicts FIFO past
   ``max_live``.

2. Stale data under in-place rewrites (ADVICE r09): plan semantics do
   not see file contents, so when an input parquet is rewritten at the
   same path mid-session, a same-plan hit would serve the OLD corpus'
   cached blocks — and the old handle's file listing — to a caller
   about to build a fresh state-keyed table from it, undermining the
   no-stale-aliasing guarantee those names exist for. Each tracked
   handle therefore records the input's corpus state (the
   ``_corpus_stat`` (mtime_ns, size) pair); a same-plan request whose
   state changed evicts the stale handle and re-persists the caller's
   FRESH frame (fresh blocks AND a fresh scan/file listing).

A ``state`` of None (the stat failed — non-local FS without a session)
degrades to plan-only keying, matching the loud warning
``_corpus_stat`` already emits for exactly that situation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class TrackedCache:
    """FIFO-bounded live list of persisted DataFrames, deduped by plan
    semantics and keyed on the input corpus state (see module doc)."""

    def __init__(self, max_live: int) -> None:
        self.max_live = max_live
        # (handle, state) per DISTINCT live plan, oldest first
        self._live: list[tuple[DataFrame, object]] = []

    @property
    def handles(self) -> list[DataFrame]:
        return [h for h, _ in self._live]

    def get(self, df: DataFrame, state: object = None) -> DataFrame:
        """The tracked persisted handle for ``df``'s plan: the existing
        one on a same-plan same-state hit (re-persisted if a
        ``catalog.clearCache()`` orphaned it), else ``df`` itself,
        newly persisted and tracked (evicting first the stale same-plan
        handle if the state moved, then FIFO past the bound)."""
        for ent in self._live:
            h, st = ent
            if df.sameSemantics(h):
                if st != state:
                    # in-place rewrite of the input: drop the stale
                    # blocks AND the stale handle (its scan pinned the
                    # old file listing); fall through to re-persist
                    # the caller's fresh frame
                    self._live.remove(ent)
                    h.unpersist(blocking=False)
                    break
                lvl = h.storageLevel
                if not (lvl.useMemory or lvl.useDisk):
                    # e.g. a catalog.clearCache() between invocations
                    # dropped the entry out from under the handle
                    h.persist()
                return h
        df = df.persist()
        self._live.append((df, state))
        while len(self._live) > self.max_live:
            self._live.pop(0)[0].unpersist(blocking=False)
        return df

    def clear(self) -> None:
        """Release every tracked handle (test harness hook)."""
        while self._live:
            self._live.pop()[0].unpersist(blocking=False)
