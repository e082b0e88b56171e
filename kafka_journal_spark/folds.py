"""Pure-Python ports of the reference's two core folds, plus the in-memory
journal model used by its exhaustive spec.

- ``head_info``   — the HeadInfo fold (reference ``journal/.../HeadInfo.scala:
  105-275``): compress a key's un-replicated Kafka head actions into
  Empty | Append(offset, seq_nr, delete_to) | Delete(delete_to) | Purge.
  Drives read planning (reference ``Journals.scala:211-292``, our
  plans/recovery.py) and the streaming head state (streaming/head_state.py).

- ``collapse``    — the Batch collapse (reference ``replicator/.../Batch.scala:
  27-156``): reduce a key's actions-within-a-poll to the minimal batches the
  storage layer must apply: drop everything before the last purge, merge
  appends, keep only the maximal delete, drop appends entirely below the
  final delete watermark, ignore marks.

- ``JournalModel`` — the in-memory single-key journal (reference
  ``journal/src/test/.../JournalSpec`` model): ground truth for property
  tests — applying ``collapse(actions)`` must equal applying ``actions``.

- ``combinations`` — the reference's exhaustive seq-splitting enumerator
  (``journal/src/test/.../Combinations.scala:16-30``): all ways to split
  ``[1..n]`` into consecutive append batches.

These are deliberately plain Python: they run driver-side on tiny per-key
groups (inside foreachBatch / applyInPandas), never over bulk data.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Iterator, Literal, Optional

Kind = Literal["append", "delete", "purge", "mark"]


@dataclass(frozen=True)
class ActionRec:
    """One action of a single key, at a Kafka offset (ActionRecord.scala:5)."""

    kind: Kind
    offset: int
    seq_nr_from: Optional[int] = None  # append only
    seq_nr_to: Optional[int] = None  # append only
    delete_to: Optional[int] = None  # delete only
    payloads: tuple = ()  # append only: one payload per seq_nr


def append_rec(offset: int, seq_from: int, seq_to: Optional[int] = None, payloads=()) -> ActionRec:
    seq_to = seq_from if seq_to is None else seq_to
    if not payloads:
        payloads = tuple(f"p{s}" for s in range(seq_from, seq_to + 1))
    return ActionRec("append", offset, seq_from, seq_to, None, payloads)


def delete_rec(offset: int, to: int) -> ActionRec:
    return ActionRec("delete", offset, delete_to=to)


def purge_rec(offset: int) -> ActionRec:
    return ActionRec("purge", offset)


def mark_rec(offset: int) -> ActionRec:
    return ActionRec("mark", offset)


# ---------------------------------------------------------------------------
# HeadInfo fold (HeadInfo.scala:105-275)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HeadInfo:
    """Summary of a key's un-replicated Kafka head.

    kind=empty  : no journal-changing actions seen
    kind=append : offset = offset of FIRST append (where the Kafka tail
                  replay must start), seq_nr = last appended, delete_to =
                  max delete watermark (clamped to seq_nr)
    kind=delete : only deletes seen; delete_to = max watermark
    kind=purge  : journal fully erased
    """

    kind: Literal["empty", "append", "delete", "purge"] = "empty"
    offset: Optional[int] = None
    seq_nr: int = 0
    delete_to: Optional[int] = None


def head_info_step(h: HeadInfo, a: ActionRec) -> HeadInfo:
    """One transition of the HeadInfo fold (semantics of HeadInfo.scala:206-275).

    - append: first append pins ``offset``; seq_nr advances to the batch's
      last seq; an earlier pure-delete watermark is kept.
    - delete: watermark maxes with any existing one; while un-appended the
      state stays ``delete``; after appends it clamps to the seen seq_nr.
    - purge: resets to ``purge`` (erases append/delete summaries).
    - mark: no-op.
    """
    if a.kind == "mark":
        return h
    if a.kind == "purge":
        return HeadInfo(kind="purge")
    if a.kind == "append":
        if h.kind == "append":
            return replace(h, seq_nr=a.seq_nr_to)
        # empty / delete / purge -> become append.  A pure-delete watermark is
        # clamped to the seq_nr just below the append's range and dropped
        # entirely when the append starts at 1 (HeadInfo.scala:232-247:
        # ``range.from.prev[Option].map { _.toDeleteTo min deleteTo }``) —
        # otherwise a foreign/redelivered stream whose delete watermark
        # overshoots the next append would plan the read past live events.
        keep = None
        if (
            h.kind == "delete"
            and h.delete_to is not None
            and a.seq_nr_from is not None
            and a.seq_nr_from > 1
        ):
            keep = min(h.delete_to, a.seq_nr_from - 1)
        return HeadInfo(kind="append", offset=a.offset, seq_nr=a.seq_nr_to, delete_to=keep)
    # delete
    to = a.delete_to
    if to is None:
        # a delete with no watermark is malformed input (the reference's
        # Action.Delete cannot carry a null deleteTo) — tolerate as a
        # no-op rather than TypeError-ing the standing head-state query;
        # the streaming path feeds ActionRec(delete_to=None) verbatim for
        # null rows (head_state.py pd.isna handling)
        return h
    if h.kind == "append":
        # min(max(oldDeleteTo, to), seqNr) — the accumulated watermark is
        # RE-clamped to the current head at every delete (HeadInfo.scala:
        # 255-262), so an append that restarts the range below an earlier
        # clamped watermark pulls it back down (e.g. append 1-10, delete 10,
        # append 1-2, delete 1 => delete_to = 2, not 10)
        base = to if h.delete_to is None else max(h.delete_to, to)
        return replace(h, delete_to=min(base, h.seq_nr))
    if h.kind == "delete":
        # h.delete_to is None only for state restored from a run that
        # predates the null-delete guard above — treat it as absent
        return replace(
            h, delete_to=to if h.delete_to is None else max(h.delete_to, to)
        )
    return HeadInfo(kind="delete", delete_to=to)


def head_info(actions: list[ActionRec]) -> HeadInfo:
    """Fold a key's head actions (offset order) into a HeadInfo."""
    h = HeadInfo()
    for a in sorted(actions, key=lambda x: x.offset):
        h = head_info_step(h, a)
    return h


# ---------------------------------------------------------------------------
# Batch collapse (Batch.scala:27-156)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Batch:
    """A collapsed storage mutation.  Application order: purge, appends, delete."""

    kind: Literal["appends", "delete", "purge"]
    offset: int  # offset at which this batch completes (idempotence guard)
    records: tuple[ActionRec, ...] = ()  # appends only
    delete_to: Optional[int] = None  # delete only


def collapse(actions: list[ActionRec]) -> list[Batch]:
    """Collapse one key's actions into minimal batches.

    Semantics (Batch.scala:81-156): everything before the last purge is
    dropped; remaining appends merge into one Appends batch; remaining
    deletes merge into one Delete with the max watermark; appends whose whole
    range is at-or-below the final watermark are dropped (their rows would be
    deleted immediately); marks are ignored.  The batch offsets preserve the
    idempotence guard: each batch carries the highest offset that produced it.
    """
    acts = sorted(actions, key=lambda x: x.offset)
    out: list[Batch] = []

    purge_off = None
    for a in acts:
        if a.kind == "purge":
            purge_off = a.offset
    if purge_off is not None:
        out.append(Batch("purge", purge_off))
        acts = [a for a in acts if a.offset > purge_off]

    deletes = [a for a in acts if a.kind == "delete"]
    appends = [a for a in acts if a.kind == "append"]

    delete_to = max((d.delete_to for d in deletes), default=None)
    kept = tuple(
        a for a in appends if delete_to is None or a.seq_nr_to > delete_to
    )
    if kept:
        out.append(Batch("appends", max(a.offset for a in kept), records=kept))
    if delete_to is not None:
        off = max(d.offset for d in deletes)
        out.append(Batch("delete", off, delete_to=delete_to))
    return out


# ---------------------------------------------------------------------------
# In-memory journal model (JournalSpec's ground truth)
# ---------------------------------------------------------------------------


@dataclass
class JournalModel:
    """Single-key journal state machine; the oracle for fold properties."""

    events: dict[int, str] = field(default_factory=dict)  # seq_nr -> payload
    delete_to: Optional[int] = None
    seq_nr: int = 0  # last appended (or delete watermark if higher)
    exists: bool = False

    def apply(self, a: ActionRec) -> None:
        if a.kind == "mark":
            return
        if a.kind == "purge":
            self.events.clear()
            self.delete_to = None
            self.seq_nr = 0
            self.exists = False
            return
        if a.kind == "append":
            first = a.seq_nr_from
            if not self.exists:
                self.exists = True
                if first > 1 and (self.delete_to is None or self.delete_to < first - 1):
                    # fresh head: delete_to = first seq - 1
                    # (ReplicatedCassandra.scala:190-216)
                    self.delete_to = first - 1 if first > 1 else None
            for i, s in enumerate(range(first, a.seq_nr_to + 1)):
                self.events[s] = a.payloads[i] if i < len(a.payloads) else f"p{s}"
            self.seq_nr = max(self.seq_nr, a.seq_nr_to)
            if self.delete_to is not None:
                for s in [s for s in self.events if s <= self.delete_to]:
                    del self.events[s]
            return
        # delete
        to = min(a.delete_to, self.seq_nr) if self.exists else a.delete_to
        if self.delete_to is None or to > self.delete_to:
            self.delete_to = to
        self.seq_nr = max(self.seq_nr, to)
        self.exists = True
        for s in [s for s in self.events if s <= self.delete_to]:
            del self.events[s]

    def apply_all(self, actions: list[ActionRec]) -> "JournalModel":
        for a in sorted(actions, key=lambda x: x.offset):
            self.apply(a)
        return self

    def apply_batches(self, batches: list[Batch]) -> "JournalModel":
        for b in batches:
            if b.kind == "purge":
                self.apply(purge_rec(b.offset))
            elif b.kind == "appends":
                for r in b.records:
                    self.apply(r)
            else:
                self.apply(delete_rec(b.offset, b.delete_to))
        return self

    def read(self, from_seq_nr: int = 1) -> list[tuple[int, str]]:
        return sorted((s, p) for s, p in self.events.items() if s >= from_seq_nr)

    def pointer(self) -> Optional[int]:
        return self.seq_nr if self.exists else None


def combinations(n: int) -> Iterator[list[list[int]]]:
    """All ways to split [1..n] into consecutive non-empty batches
    (Combinations.scala:16-30).  combinations(0) yields [[]] once."""
    if n == 0:
        yield []
        return
    # compositions of n: choose cut points in the n-1 gaps
    for mask in range(1 << (n - 1)):
        batches: list[list[int]] = [[1]]
        for i in range(2, n + 1):
            if mask & (1 << (i - 2)):
                batches.append([i])
            else:
                batches[-1].append(i)
        yield batches
