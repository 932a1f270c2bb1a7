import numpy as np

from danet_densepose2smpl_tpu.ops.structure import (
    DP2SMPL_MAPPING,
    NUM_SMPL_JOINTS,
    SMPL_BRANCHES,
    SMPL_EDGES,
    SMPL_PARENT,
    smpl_adjacency,
)


def test_parent_tree_rooted():
    assert SMPL_PARENT[0] == 0
    for j in range(1, NUM_SMPL_JOINTS):
        # Walking up parents always reaches the root.
        cur, steps = j, 0
        while cur != 0:
            cur = SMPL_PARENT[cur]
            steps += 1
            assert steps < NUM_SMPL_JOINTS


def test_branches_cover_all_nonroot_joints():
    covered = [j for br in SMPL_BRANCHES for j in br]
    assert len(covered) == len(set(covered))
    assert set(covered) == set(range(NUM_SMPL_JOINTS))


def test_adjacency_normalized_digraph():
    A = smpl_adjacency(max_hop=1, normalize="digraph")
    assert A.shape == (24, 24)
    np.testing.assert_allclose(A.sum(axis=0), 1.0, atol=1e-5)
    # Self-loops present; edges symmetric as a support pattern.
    assert np.all(np.diag(A) > 0)
    support = A > 0
    np.testing.assert_array_equal(support, support.T)
    for p, c in SMPL_EDGES:
        assert support[p, c]


def test_adjacency_two_hop_larger_support():
    A1 = smpl_adjacency(max_hop=1)
    A2 = smpl_adjacency(max_hop=2)
    assert (A2 > 0).sum() > (A1 > 0).sum()


def test_dp2smpl_mapping_shape_and_range():
    assert DP2SMPL_MAPPING.shape == (24, 6)
    assert DP2SMPL_MAPPING.min() >= 1 and DP2SMPL_MAPPING.max() <= 24
