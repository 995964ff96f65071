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


@pytest.mark.slow
def test_sticky_open_cap_escalation_matches_unbatched():
    """A sweep whose frames ALL overflow the open-ray compaction cap
    escalates its own config for later chunks (sticky, one escalated
    program) instead of serially retrying every chunk; results stay
    identical to the per-batch analyze path (which retries each batch).

    The octahedron leaves ~95% of spiral rays open, far above the 0.4
    default cap fraction.
    """
    import numpy as np

    from pywindow_tpu.ops.analysis import max_dim_host
    from pywindow_tpu.parallel.batch import analyze_batch, sweep_uniform

    elements = np.array(["C"] * 6)
    base = 8.0 * np.array(
        [
            [1.0, 0, 0], [-1.0, 0, 0],
            [0, 1.0, 0], [0, -1.0, 0],
            [0, 0, 1.0], [0, 0, -1.0],
        ]
    )
    # slight per-frame scale spread, same discrete sampling sizes
    coords = np.stack([base * (1.0 + 0.001 * k) for k in range(8)])
    maxd = np.array([max_dim_host(elements, c) for c in coords])

    ref = analyze_batch(
        [(elements, c) for c in coords],
        reference_max_diameter=float(maxd.max()),
    )

    got: dict = {}
    sweep_uniform(
        elements, coords, maxd,
        lambda part, res: got.update(zip(map(int, part), res)),
        batch_size=2,
        reference_max_diameter=float(maxd.max()),
    )
    assert sorted(got) == list(range(8))
    for f, a in enumerate(ref):
        b = got[f]
        assert (
            a["pore_diameter"]["diameter"]
            == b["pore_diameter"]["diameter"]
        )
        wa, wb = a["windows"]["diameters"], b["windows"]["diameters"]
        if wa is None:
            assert wb is None
        else:
            np.testing.assert_array_equal(np.sort(wa), np.sort(wb))
