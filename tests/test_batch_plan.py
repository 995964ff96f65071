"""Sweep chunk-plan unit tests (pywindow_tpu.parallel.batch.chunk_plan).

The plan shapes what the sweep pipeline compiles and how much padded
work it dispatches; these tests pin the invariants the e2e bench
relies on (exact coverage, boundary alignment, no padded-work
regression on divisible sweeps).
"""

from __future__ import annotations

import pytest

from pywindow_tpu.parallel.batch import chunk_plan


def _check_cover(plan, n_frames):
    lo_prev = 0
    for lo, hi, m in plan:
        assert lo == lo_prev
        assert hi > lo
        assert m >= hi - lo
        lo_prev = hi
    assert lo_prev == n_frames


def test_single_shape_small_chunks():
    # below the ladder threshold: every chunk padded to c
    plan = chunk_plan(1000, 256)
    _check_cover(plan, 1000)
    assert {m for _, _, m in plan} == {256}


def test_ladder_divisible_sweep_dispatches_exactly():
    # 5 full chunks: starter + realign must NOT add padded frames
    plan = chunk_plan(21600, 4320, ladder=True)
    _check_cover(plan, 21600)
    assert plan[0] == (0, 1080, 1080)
    assert plan[1] == (1080, 4320, 3240)
    assert sum(m for _, _, m in plan) == 21600
    # later boundaries sit on multiples of c
    assert all(lo % 4320 == 0 for lo, _, _ in plan[2:])


def test_ladder_tail_fits_smallest_shape():
    plan = chunk_plan(4320 * 2 + 663, 4320, ladder=True)
    _check_cover(plan, 4320 * 2 + 663)
    assert plan[-1][2] == 1080  # 663-frame tail pads to the quarter
    # at most four distinct compiled shapes
    assert len({m for _, _, m in plan}) <= 4


def test_ladder_off_by_default():
    # the A/B-measured default: every chunk padded to c, no starter
    plan = chunk_plan(21600, 4320)
    _check_cover(plan, 21600)
    assert {m for _, _, m in plan} == {4320}
    assert len(plan) == 5


def test_ladder_single_chunk_sweep():
    # n_frames <= c: one chunk, no ladder
    plan = chunk_plan(4000, 4320, ladder=True)
    assert plan == [(0, 4000, 4320)]


def test_ladder_between_starter_and_full():
    plan = chunk_plan(2000, 4320, ladder=True)
    assert plan == [(0, 2000, 4320)]  # n_frames <= c: single chunk
    plan = chunk_plan(5000, 4320, ladder=True)
    _check_cover(plan, 5000)
    assert plan[0] == (0, 1080, 1080)
    assert plan[1] == (1080, 4320, 3240)
    assert plan[2] == (4320, 5000, 1080)


@pytest.mark.parametrize("n_dev", [1, 8])
def test_ladder_shard_alignment(n_dev):
    plan = chunk_plan(4096 * 3, 4096, ladder=True, n_dev=n_dev)
    _check_cover(plan, 4096 * 3)
    for _, _, m in plan:
        assert m % n_dev == 0
