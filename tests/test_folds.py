"""Unit + property tests for the pure folds, mirroring the reference's
HeadInfoSpec / BatchSpec / CombinationsSpec."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_journal_spark.folds import (
    ActionRec,
    HeadInfo,
    JournalModel,
    append_rec,
    collapse,
    combinations,
    delete_rec,
    head_info,
    mark_rec,
    purge_rec,
)

# -------------------------- HeadInfo (HeadInfoSpec) --------------------------


def test_head_info_empty():
    assert head_info([]) == HeadInfo(kind="empty")
    assert head_info([mark_rec(5)]) == HeadInfo(kind="empty")


def test_head_info_append():
    h = head_info([append_rec(10, 1, 3), append_rec(12, 4, 5)])
    assert h == HeadInfo(kind="append", offset=10, seq_nr=5, delete_to=None)


def test_head_info_append_pins_first_offset():
    h = head_info([mark_rec(1), append_rec(7, 1), append_rec(9, 2)])
    assert h.offset == 7


def test_head_info_delete_only():
    assert head_info([delete_rec(3, 4)]) == HeadInfo(kind="delete", delete_to=4)
    assert head_info([delete_rec(3, 4), delete_rec(4, 2)]) == HeadInfo(
        kind="delete", delete_to=4
    )


def test_head_info_append_then_delete_clamps():
    h = head_info([append_rec(1, 1, 3), delete_rec(2, 9)])
    assert h == HeadInfo(kind="append", offset=1, seq_nr=3, delete_to=3)


def test_head_info_delete_then_append_keeps_watermark():
    h = head_info([delete_rec(1, 4), append_rec(2, 5, 6)])
    assert h == HeadInfo(kind="append", offset=2, seq_nr=6, delete_to=4)


def test_head_info_append_after_delete_clamps_watermark():
    # HeadInfo.scala:232-247: the pure-delete watermark is clamped to
    # range.from - 1 when the first append arrives — a foreign stream whose
    # delete overshoots the next append must not plan the read past live
    # events
    h = head_info([delete_rec(1, 100), append_rec(2, 5, 6)])
    assert h == HeadInfo(kind="append", offset=2, seq_nr=6, delete_to=4)


def test_head_info_append_at_one_after_delete_drops_watermark():
    # range.from.prev is None for from == 1 -> deleteTo dropped entirely
    h = head_info([delete_rec(1, 100), append_rec(2, 1, 2)])
    assert h == HeadInfo(kind="append", offset=2, seq_nr=2, delete_to=None)


@given(
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
)
def test_head_info_delete_append_clamp_property(del_to, seq_from, n):
    # delete(to) then append [from, from+n): the kept watermark is always
    # None (from == 1) or min(to, from - 1) — never >= the append range
    h = head_info([delete_rec(1, del_to), append_rec(2, seq_from, seq_from + n - 1)])
    expected = None if seq_from == 1 else min(del_to, seq_from - 1)
    assert h.delete_to == expected
    if h.delete_to is not None:
        assert h.delete_to < seq_from


def test_head_info_purge_resets():
    assert head_info([append_rec(1, 1), purge_rec(2)]) == HeadInfo(kind="purge")
    h = head_info([append_rec(1, 1), purge_rec(2), append_rec(3, 2)])
    assert h == HeadInfo(kind="append", offset=3, seq_nr=2, delete_to=None)
    assert head_info([purge_rec(1), delete_rec(2, 3)]) == HeadInfo(
        kind="delete", delete_to=3
    )


# ------------------------- Batch collapse (BatchSpec) ------------------------


def test_collapse_merges_appends():
    a1, a2 = append_rec(1, 1, 2), append_rec(2, 3, 4)
    [b] = collapse([a1, a2])
    assert b.kind == "appends" and b.records == (a1, a2) and b.offset == 2


def test_collapse_delete_covers_delete():
    out = collapse([delete_rec(1, 2), delete_rec(2, 5), delete_rec(3, 3)])
    assert [(b.kind, b.delete_to, b.offset) for b in out] == [("delete", 5, 3)]


def test_collapse_drops_appends_below_delete():
    out = collapse([append_rec(1, 1, 2), append_rec(2, 3, 4), delete_rec(3, 2)])
    kinds = [(b.kind, b.offset) for b in out]
    assert kinds == [("appends", 2), ("delete", 3)]
    [ap] = [b for b in out if b.kind == "appends"]
    assert [r.seq_nr_from for r in ap.records] == [3]


def test_collapse_purge_shadows_everything():
    out = collapse(
        [append_rec(1, 1), delete_rec(2, 1), purge_rec(3), append_rec(4, 2)]
    )
    assert [(b.kind, b.offset) for b in out] == [("purge", 3), ("appends", 4)]


def test_collapse_marks_ignored():
    assert collapse([mark_rec(1), mark_rec(2)]) == []


# ------------------ property: collapse ≡ replay (JournalModel) ---------------


@st.composite
def action_sequences(draw):
    """Writer-valid per-key action sequences: seq_nrs contiguous ascending;
    deletes only when a pointer exists, clamped to it (reference
    Journals.scala:326-332 — the client no-ops deletes on absent journals and
    clamps delete_to to the current pointer); purge resets the pointer."""
    n = draw(st.integers(0, 12))
    actions: list[ActionRec] = []
    next_seq = 1
    pointer = None  # last seq_nr visible to the writer; None = journal absent
    for off in range(n):
        kind = draw(st.sampled_from(["append", "append", "delete", "purge", "mark"]))
        if kind == "append":
            width = draw(st.integers(1, 3))
            actions.append(append_rec(off, next_seq, next_seq + width - 1))
            next_seq += width
            pointer = next_seq - 1
        elif kind == "delete":
            if pointer is None:
                continue  # writer refuses deletes on absent journals
            actions.append(delete_rec(off, draw(st.integers(1, pointer))))
        elif kind == "purge":
            actions.append(purge_rec(off))
            pointer = None
        else:
            actions.append(mark_rec(off))
    return actions


@given(action_sequences())
@settings(max_examples=300, deadline=None)
def test_collapse_equivalent_to_replay(actions):
    direct = JournalModel().apply_all(actions)
    batched = JournalModel().apply_batches(collapse(actions))
    assert batched.read() == direct.read()
    assert batched.pointer() == direct.pointer()
    assert batched.delete_to == direct.delete_to


@given(action_sequences())
@settings(max_examples=300, deadline=None)
def test_head_info_matches_model_visibility(actions):
    """HeadInfo's summary agrees with the model: seq_nr tracks the last
    append; purge state means empty journal; delete watermark never exceeds
    the appended seq_nr once appends exist."""
    h = head_info(actions)
    m = JournalModel().apply_all(actions)
    if h.kind == "append":
        assert h.seq_nr == max((a.seq_nr_to for a in actions if a.kind == "append"))
        if h.delete_to is not None:
            assert h.delete_to <= h.seq_nr
    if h.kind == "purge":
        assert m.read() == []
    if h.kind == "empty":
        assert m.read() == [] and m.pointer() is None


# ------------------------ Combinations (CombinationsSpec) --------------------


def test_combinations_counts():
    # compositions of n: 2^(n-1); combinations(0) = [[]]
    assert [len(list(combinations(n))) for n in range(6)] == [1, 1, 2, 4, 8, 16]


def test_combinations_cover_all_splits():
    got = {tuple(tuple(b) for b in c) for c in combinations(3)}
    assert got == {((1, 2, 3),), ((1,), (2, 3)), ((1, 2), (3,)), ((1,), (2,), (3,))}


def test_delete_reclamps_after_append_restart():
    """ADVICE regression (HeadInfo.scala:255-262): append 1-10, delete 10,
    append 1-2, delete 1 -> the watermark is pulled DOWN to 2 by the
    re-clamp against the restarted head, not kept at the stale 10."""
    h = head_info(
        [
            ActionRec("append", 0, 1, 10, None),
            ActionRec("delete", 1, None, None, 10),
            ActionRec("append", 2, 1, 2, None),
            ActionRec("delete", 3, None, None, 1),
        ]
    )
    assert h.kind == "append"
    # HeadInfo.scala append branch: copy(seqNr = range.to) — the LAST
    # append's range wins, so the head follows the restart
    assert h.seq_nr == 2
    assert h.delete_to == 2


def test_null_delete_to_is_tolerated_not_crashed():
    """A delete whose delete_to is None is malformed input (the reference's
    Action.Delete cannot carry one), but the streaming head-state path
    feeds such rows verbatim from null columns — the fold must treat them
    as no-ops in EVERY state, never TypeError (max/min of int and None
    used to kill the standing query)."""
    null_del = ActionRec("delete", 5, None, None, None)
    # empty state: no-op, stays empty
    assert head_info([null_del]) == HeadInfo()
    # append state: watermark unchanged
    h = head_info([ActionRec("append", 0, 1, 3, None), null_del])
    assert h.kind == "append" and h.seq_nr == 3 and h.delete_to is None
    # delete state: existing watermark survives
    h = head_info(
        [ActionRec("delete", 0, None, None, 7), null_del]
    )
    assert h.kind == "delete" and h.delete_to == 7
    # and a real delete after the malformed one still applies
    h = head_info(
        [ActionRec("append", 0, 1, 9, None), null_del,
         ActionRec("delete", 6, None, None, 4)]
    )
    assert h.delete_to == 4
