import numpy as np

from hippomm_tpu.utils import vector_ops as vo


def test_cosine_similarity_matches_numpy(rng):
    a = rng.normal(size=1024).astype(np.float32)
    b = rng.normal(size=1024).astype(np.float32)
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(vo.cosine_similarity(a, b) - expected) < 1e-5


def test_top_k_cosine_similarity(rng):
    feats = rng.normal(size=(100, 64)).astype(np.float32)
    q = rng.normal(size=64).astype(np.float32)
    idx, vals = vo.top_k_cosine_similarity(q, feats, k=5)
    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sims = fn @ (q / np.linalg.norm(q))
    expected = np.argsort(-sims)[:5]
    np.testing.assert_array_equal(idx, expected)
    np.testing.assert_allclose(vals, sims[expected], rtol=1e-5, atol=1e-5)
    assert np.all(np.diff(vals) <= 1e-7)


def test_top_k_clamps_k(rng):
    feats = rng.normal(size=(3, 8)).astype(np.float32)
    idx, vals = vo.top_k_cosine_similarity(rng.normal(size=8), feats, k=10)
    assert len(idx) == 3


def test_entropy():
    # reference semantics (vector_ops.py:22-35): abs → prob dist → Shannon
    assert abs(vo.compute_entropy([0.5, 0.5]) - 1.0) < 1e-9
    assert abs(vo.compute_entropy([-0.5, 0.5]) - 1.0) < 1e-9  # abs() applied
    assert vo.compute_entropy([1.0, 0.0]) == 0.0


def test_temporal_overlap():
    # reference signature (vector_ops.py:37-54): two tuples + threshold → bool
    assert vo.temporal_overlap((0, 10), (5, 15), threshold=0.5) is True
    assert vo.temporal_overlap((0, 10), (5, 15), threshold=0.6) is False
    assert vo.temporal_overlap((0, 10), (20, 30)) is False
    assert vo.temporal_overlap((0, 10), (2, 4)) is True  # full containment


def test_misc_helpers(rng):
    f = rng.normal(size=(5, 16)).astype(np.float32)
    # feature_flow (vector_ops.py:72-79): two vectors + threshold → bool
    assert vo.feature_flow(f[0], f[0]) is True
    assert vo.feature_flow(f[0], -f[0], threshold=0.0) is False
    # merge_features (vector_ops.py:81-100): unnormalized weights, L2-normed out
    merged = vo.merge_features([f[0], f[1]], weights=[1.0, 3.0])
    expected = 1.0 * f[0] + 3.0 * f[1]
    np.testing.assert_allclose(
        merged, expected / np.linalg.norm(expected), rtol=1e-5
    )
    assert abs(np.linalg.norm(vo.merge_features([f[0], f[1]])) - 1.0) < 1e-5
    # gaussian_temporal_weighting (vector_ops.py:102-108): norm.pdf semantics
    w = vo.gaussian_temporal_weighting([0.0, 1.0, 2.0], center=1.0, sigma=1.0)
    assert abs(w[1] - 1.0 / np.sqrt(2 * np.pi)) < 1e-9 and w[0] < w[1]
    # compute_feature_statistics (vector_ops.py:110-122): (mean, std, entropy)
    mean, std, ent = vo.compute_feature_statistics(f)
    assert abs(mean - f.mean()) < 1e-5 and abs(std - f.std()) < 1e-5
    assert ent == vo.compute_entropy(f)
    # normalize_features (vector_ops.py:124-149): flattens, method-selectable
    nf = vo.normalize_features(f)
    assert nf.shape == (80,) and abs(np.linalg.norm(nf) - 1.0) < 1e-5
    n1 = vo.normalize_features(f[0], method="l1")
    assert abs(np.sum(np.abs(n1)) - 1.0) < 1e-5
    nmax = vo.normalize_features(f[0], method="max")
    assert abs(np.max(np.abs(nmax)) - 1.0) < 1e-5
    # spatial_distance (vector_ops.py:56-70): grid coords / grid diagonal
    assert vo.spatial_distance((0, 0), (0, 0)) == 0.0
    assert abs(vo.spatial_distance((0, 0), (16, 16)) - 1.0) < 1e-9


def test_select_keyframes_matches_greedy_reference(rng):
    from hippomm_tpu.ops.similarity import select_keyframes

    # clustered features so dedup actually triggers
    base = rng.normal(size=(4, 1024)).astype(np.float32)
    feats = np.concatenate(
        [base[i] + 0.01 * rng.normal(size=(7, 1024)).astype(np.float32) for i in range(4)]
    )
    order = rng.permutation(len(feats))
    feats = feats[order]

    # python greedy oracle (reference semantics, hippocampal_memory.py:944-967)
    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sims = fn @ fn.T
    selected = [0]
    for i in range(1, len(feats)):
        if all(sims[i, j] < 0.9 for j in selected):
            selected.append(i)

    got = select_keyframes(feats, threshold=0.9)
    np.testing.assert_array_equal(got, np.array(selected))
    assert 2 <= len(got) <= 8

    # n=28 routed to the host greedy; force the DEVICE scan over the same
    # input and require identical selections (small-N routing must be a pure
    # latency decision, never a semantics one)
    import hippomm_tpu.ops.similarity as sim

    orig = sim._HOST_DEDUP_MAX_N
    sim._HOST_DEDUP_MAX_N = 0
    try:
        dev = select_keyframes(feats, threshold=0.9)
    finally:
        sim._HOST_DEDUP_MAX_N = orig
    np.testing.assert_array_equal(dev, got)
