"""FunctionIntegrator convergence harness + IntegrationAnalyzer tests."""
import numpy as np

from acceleratedvolrenderer_tpu.models.integrators.function import (
    FUNCTIONS, render_function, write_mse_file)


def test_function_estimates_converge():
    for name in ("step", "diagonal", "disk", "gaussian"):
        est, curve = render_function(name, width=8, height=8, spp=64,
                                     sampler="independent")
        exact = FUNCTIONS[name][1]
        assert abs(est.mean() - exact) < 0.15, (name, est.mean(), exact)
        # mse shrinks with more samples
        assert curve[-1][1] < curve[0][1], (name, curve)


def test_stratified_beats_independent_on_smooth():
    _, c_ind = render_function("gaussian", width=8, height=8, spp=64,
                               sampler="independent")
    _, c_str = render_function("gaussian", width=8, height=8, spp=64,
                               sampler="sobol")
    assert c_str[-1][1] < c_ind[-1][1]


def test_mse_file(tmp_path):
    _, curve = render_function("step", width=4, height=4, spp=16)
    p = tmp_path / "step-mse.txt"
    write_mse_file(str(p), curve)
    lines = p.read_text().strip().splitlines()
    assert len(lines) == len(curve)
    assert lines[0].split()[0] == "1"


def test_analyzer_on_sphere_medium():
    from acceleratedvolrenderer_tpu.graph import analyzer as an
    from acceleratedvolrenderer_tpu.graph.builder import FreeGraphBuilder
    from acceleratedvolrenderer_tpu.graph.config import GraphBuilderConfig
    from acceleratedvolrenderer_tpu.scene import presets

    sc = presets.sphere_medium(res=16, height=16, spp=1, max_depth=4)
    cfg = GraphBuilderConfig(dimension_steps=6, iterations_per_step=2)
    light_dir = np.array([0.0, -1.0, 0.0])
    g = FreeGraphBuilder(sc.medium, light_dir, cfg, seed=1).build()
    assert g.n_vertices > 0
    res = an.analyze(sc, g, [(8, 8), (4, 4)], spp=4)
    assert res.total_scatters > 0
    assert 0 <= res.node_scatters <= res.search_scatters <= res.total_scatters
    s = str(res)
    assert "/" in s and "(" in s
