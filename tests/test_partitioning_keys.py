"""Properties of the partitioning/layout key operators: rendezvous
(highest-random-weight) resharding movement, balance, and Z-order locality.
The hash helpers are pure functions — no Ray needed."""

import numpy as np

from ptt_spider_go_ray.queries import _rendezvous_shard


def test_rendezvous_growth_moves_only_to_new_shard():
    """The HRW invariant: adding shard K leaves every surviving key in
    place — any key whose assignment changes must land on the NEW shard."""
    ids = np.arange(50_000, dtype=np.int64)
    s8 = _rendezvous_shard(ids, 8)
    s9 = _rendezvous_shard(ids, 9)
    moved = s8 != s9
    assert moved.any()
    assert (s9[moved] == 8).all()
    # expected movement ≈ 1/9 of keys; allow generous slack
    assert 0.05 < moved.mean() < 0.20


def test_rendezvous_balance_on_sequential_ids():
    """Sequential id ranges (the adversarial input for linear hashes) stay
    within ±10% of the ideal shard size after the xor-fold re-mix."""
    ids = np.arange(80_000, dtype=np.int64)
    counts = np.bincount(_rendezvous_shard(ids, 8), minlength=8)
    ideal = len(ids) / 8
    assert counts.min() > ideal * 0.9 and counts.max() < ideal * 1.1


def test_rendezvous_deterministic_and_in_range():
    ids = np.array([0, 1, 2**31, 2**40, 7_777_777], dtype=np.int64)
    a = _rendezvous_shard(ids, 8)
    b = _rendezvous_shard(ids.copy(), 8)
    assert (a == b).all()
    assert ((a >= 0) & (a < 8)).all()
