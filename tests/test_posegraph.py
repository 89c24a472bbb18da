import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.tracking import posegraph as pg


def _exp(xi):
    return pg._exp(np.asarray(xi))


def make_noisy_loop(n=30, seed=0, drift=0.01):
    """Ground-truth circular trajectory; odometry edges with accumulating
    noise; one exact loop-closure edge back to the start."""
    rng = np.random.RandomState(seed)
    truth = []
    T = np.eye(4)
    step = _exp([0.1, 0, 0, 0, 2 * np.pi / n, 0])
    for i in range(n):
        truth.append(T.copy())
        T = T @ step

    graph = pg.PoseGraph()
    est = np.eye(4)
    graph.add_node(est.copy())
    for i in range(1, n):
        rel_true = np.linalg.inv(truth[i - 1]) @ truth[i]
        noise = _exp(rng.uniform(-drift, drift, 6))
        rel_noisy = rel_true @ noise
        est = est @ rel_noisy
        graph.add_node(est.copy())
        # Open3D edge convention: T maps target coords into source coords
        graph.add_edge(i - 1, i, rel_noisy)
    # exact loop closure last -> first
    rel_loop = np.linalg.inv(truth[n - 1]) @ truth[0]
    graph.add_edge(n - 1, 0, rel_loop, uncertain=True)
    return graph, truth


def pose_errs(nodes, truth):
    return [np.linalg.norm(n[:3, 3] - t[:3, 3]) for n, t in zip(nodes, truth)]


def test_exp_log_roundtrip_f64():
    rng = np.random.RandomState(1)
    for _ in range(10):
        xi = rng.uniform(-1, 1, 6)
        np.testing.assert_allclose(pg._log(_exp(xi)), xi, atol=1e-10)


def test_optimization_reduces_drift():
    """The loop closure pins the trajectory's end: terminal drift and the
    loop-edge residual must collapse (mid-trajectory noise is irreducible —
    optimization satisfies the noisy odometry edges, not ground truth)."""
    graph, truth = make_noisy_loop()
    before = pose_errs(graph.nodes, truth)
    loop_before = np.linalg.norm(
        pg._edge_residual(graph.nodes, graph.edges[-1])[0])
    opt = pg.optimize(graph, max_iterations=50)
    after = pose_errs(opt.nodes, truth)
    loop_after = np.linalg.norm(pg._edge_residual(opt.nodes, opt.edges[-1])[0])
    assert after[-1] < 0.2 * before[-1], "terminal drift must collapse"
    assert loop_after < 0.1 * loop_before
    # all edge residuals consistent after optimization
    for e in opt.edges:
        r, _, _ = pg._edge_residual(opt.nodes, e)
        assert np.linalg.norm(r) < 0.05


def test_prune_bad_loop_closure():
    graph, truth = make_noisy_loop()
    # inject a WRONG loop closure
    bogus = _exp([1.5, 0, 0, 0, 0, 0])
    graph.add_edge(10, 25, bogus, uncertain=True)
    opt = pg.optimize(graph, max_iterations=50, edge_prune_threshold=0.25)
    kept = [(e.source, e.target) for e in opt.edges if e.uncertain]
    assert (10, 25) not in kept, "diverged loop closure must be pruned"
    assert (29, 0) in kept, "good loop closure must survive"


def test_json_roundtrip(tmp_path):
    graph, _ = make_noisy_loop(n=5)
    p = str(tmp_path / "pg.json")
    graph.save(p)
    g2 = pg.PoseGraph.load(p)
    assert len(g2.nodes) == len(graph.nodes)
    assert len(g2.edges) == len(graph.edges)
    np.testing.assert_allclose(g2.nodes[3], graph.nodes[3])
    np.testing.assert_allclose(g2.edges[0].transformation,
                               graph.edges[0].transformation)


def test_find_loop_closures():
    # a path that returns near its origin
    pos = [(np.cos(a), np.sin(a), 0.0) for a in np.linspace(0, 2 * np.pi, 40)]
    cands = pg.find_loop_closures(np.asarray(pos) * 2.0, radius=0.7, min_gap=20)
    assert len(cands) > 0
    for i, j in cands:
        assert j - i >= 20
        assert np.linalg.norm(np.asarray(pos[j]) * 2 - np.asarray(pos[i]) * 2) < 0.7
