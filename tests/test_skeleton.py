import numpy as np

from kasportsformer_tpu import skeleton


def test_bone_lists_match_reference_constants():
    # model/KASportsFormer.py:46-47
    assert list(skeleton.BONE_CHILD) == [0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8, 14, 15]
    assert list(skeleton.BONE_PARENT) == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
    assert len(skeleton.LIMB_PAIRS) == 16
    assert len(skeleton.ANGLE_PAIRS) == 18


def test_spatial_adjacency_matches_reference_connections():
    # model/modules/graph.py:16-17
    connections = {10: [9], 9: [8, 10], 8: [7, 9, 11, 14], 14: [15, 8], 15: [16, 14],
                   11: [12, 8], 12: [13, 11], 7: [0, 8], 0: [1, 7, 4], 1: [2, 0],
                   2: [3, 1], 4: [5, 0], 5: [6, 4], 16: [15], 13: [12], 3: [2], 6: [5]}
    expected = np.zeros((17, 17), dtype=np.float32)
    for i in range(17):
        for j in connections[i]:
            expected[i, j] = 1.0
    np.testing.assert_array_equal(skeleton.spatial_adjacency(), expected)
    # symmetric, no self loops
    adj = skeleton.spatial_adjacency()
    np.testing.assert_array_equal(adj, adj.T)
    assert np.all(np.diag(adj) == 0)


def test_temporal_adjacency():
    adj = skeleton.temporal_adjacency(5, connection_len=1)
    expected = np.eye(5, dtype=np.float32) + np.eye(5, k=1, dtype=np.float32)
    np.testing.assert_array_equal(adj, expected)


def test_flip_perm_is_involution():
    perm = skeleton.FLIP_PERM
    assert sorted(perm.tolist()) == list(range(17))
    np.testing.assert_array_equal(perm[perm], np.arange(17))
    # spot-check the swap set: 1<->4, 2<->5, 3<->6, 14<->11, 15<->12, 16<->13
    assert perm[1] == 4 and perm[4] == 1
    assert perm[14] == 11 and perm[11] == 14


def test_limb_combinations():
    assert len(skeleton.LIMB_COMBINATIONS) == 17
    idx, mask = skeleton.limb_combination_matrix()
    assert idx.shape == (17, 4) and mask.shape == (17, 4)
    # row 2 is (6, 7) padded
    np.testing.assert_array_equal(idx[2], [6, 7, 0, 0])
    np.testing.assert_array_equal(mask[2], [1, 1, 0, 0])
    # mask counts match combo lengths
    for row, combo in enumerate(skeleton.LIMB_COMBINATIONS):
        assert mask[row].sum() == len(combo)
