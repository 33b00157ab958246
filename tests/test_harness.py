"""Tests for the harness layers: metrics, analysis, sandbox."""

import json
import textwrap
from pathlib import Path

import numpy as np
import pytest

from pdebench_tpu.analysis import ErrorClassifier, GateAnalyzer
from pdebench_tpu.metrics import (
    check_tier_levels,
    compute_score,
    compute_universal_metrics,
    generate_tier_levels,
    get_specialized_metrics_computer,
)
from pdebench_tpu.metrics.universal import compute_metrics_from_arrays
from pdebench_tpu.sandbox import CppExecutor, execute_agent_function
from pdebench_tpu.sandbox.executor import build_agent_case_spec


def _case():
    return {
        "id": "t1",
        "oracle_config": {
            "pde": {
                "type": "poisson",
                "source_term": "1.0",
                "manufactured_solution": {"u": "x"},
            },
            "domain": {"type": "unit_square"},
            "mesh": {"resolution": 64},
            "fem": {"degree": 1},
            "oracle_solver": {"ksp_type": "cg"},
            "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 8, "ny": 8}},
        },
    }


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_universal_metrics_arrays():
    ref = np.outer(np.linspace(0, 1, 16), np.ones(16))
    agent = ref + 0.01
    m = compute_metrics_from_arrays(agent, ref)
    assert abs(m["rmse"] - 0.01) < 1e-12
    assert abs(m["mae"] - 0.01) < 1e-12
    assert m["r2"] > 0.98
    assert "frmse_low" in m and "frmse_total" in m
    # Parseval: total fRMSE == spatial RMSE for full-band
    assert abs(m["frmse_total"] - m["rmse"]) < 1e-10


def test_universal_metrics_nan_mask():
    ref = np.ones((8, 8))
    ref[0, :] = np.nan
    agent = np.ones((8, 8)) * 1.5
    m = compute_metrics_from_arrays(agent, ref)
    assert abs(m["mae"] - 0.5) < 1e-12


def test_universal_metrics_files(tmp_path):
    u = np.random.default_rng(0).random((8, 8))
    np.savez(tmp_path / "solution.npz", u=u)
    ref = u + 0.1
    oracle_info = {
        "reference": [None if np.isnan(v) else float(v) for v in ref.ravel()],
        "reference_shape": [8, 8],
    }
    m = compute_universal_metrics(tmp_path, oracle_info)
    assert abs(m["rmse"] - 0.1) < 1e-12


def test_scoring_modes():
    assert compute_score("fix_accuracy", 1.0, 0.005, 0.01, 10.0) == 100.0
    assert compute_score("fix_accuracy", 1.0, 0.02, 0.01, 10.0) == 0.0
    assert compute_score("fix_time", 8.0, 0.005, 0.01, 10.0) == 50.0
    assert compute_score("fix_time", 11.0, 0.005, 0.01, 10.0) == 0.0
    assert compute_score("fix_time", 8.0, 0.02, 0.01, 10.0) == 10.0


def test_tier_levels():
    tiers = generate_tier_levels(1e-4, 1.0)
    assert tiers["accuracy"]["level_1"]["target_error"] == pytest.approx(1e-2)
    r = check_tier_levels("fix_accuracy", 0.5, 1e-5, tiers)
    assert r["passed"] == [1, 2]
    r = check_tier_levels("fix_time", 0.05, 1e-4, tiers)
    assert r["passed"] == [1, 2, 3]


def test_specialized_computers(tmp_path):
    u = np.random.default_rng(0).random((8, 8))
    np.savez(tmp_path / "solution.npz", u=u)
    (tmp_path / "meta.json").write_text(
        json.dumps(
            {
                "solver_info": {
                    "mesh_resolution": 32,
                    "element_degree": 1,
                    "iterations": 40,
                    "dt": 0.01,
                    "num_steps": 10,
                }
            }
        )
    )
    cfg = _case()["oracle_config"]
    for mt in (
        "elliptic", "parabolic", "hyperbolic", "incompressible_flow",
        "mixed_type", "dispersive", "reaction_diffusion",
        "compressible_flow", "kinetic", "fractional", "stochastic",
        "multiphysics",
    ):
        comp = get_specialized_metrics_computer(mt, tmp_path, tmp_path, cfg)
        assert comp is not None, mt
        m = comp.compute({"runtime_sec": 2.0})
        assert isinstance(m, dict)
        assert "error" not in m, (mt, m)
    assert get_specialized_metrics_computer("bogus", tmp_path, tmp_path, cfg) is None


# ---------------------------------------------------------------------------
# analysis
# ---------------------------------------------------------------------------


def test_gate_analyzer_order():
    ga = GateAnalyzer()
    b = ga.analyze_single_case(
        "c1",
        {"success": True, "error": 1e-4, "time": 0.5},
        {"target_error": 1e-3, "target_time": 1.0},
        {},
    )
    assert b.final_pass
    b = ga.analyze_single_case(
        "c2",
        {"success": True, "error": 1e-2, "time": 0.5},
        {"target_error": 1e-3, "target_time": 1.0},
        {},
    )
    assert b.failure_stage == "accuracy" and not b.time_pass
    b = ga.analyze_single_case(
        "c3",
        {"success": True, "error": 1e-4, "time": 5.0},
        {"target_error": 1e-3, "target_time": 1.0},
        {},
    )
    assert b.failure_stage == "time" and b.accuracy_pass
    stats = ga.compute_aggregate_statistics(
        [
            ga.analyze_single_case("a", {"success": False}, {}, {}),
            b,
        ]
    )
    assert stats["total_cases"] == 2
    assert stats["exec_valid_rate"] == 0.5


def test_error_classifier():
    ec = ErrorClassifier()
    assert ec.classify({"status": "PASS"}) is None
    assert (
        ec.classify({"status": "FAIL", "stderr": "SyntaxError: invalid syntax"})
        == "syntax_error"
    )
    assert (
        ec.classify({"status": "FAIL", "stderr": "ModuleNotFoundError: no module named 'foo'"})
        == "import_error"
    )
    assert (
        ec.classify({"status": "FAIL", "stderr": "KSP_DIVERGED_ITS: did not converge"})
        == "convergence_error"
    )
    assert (
        ec.classify({"status": "TIMEOUT", "stderr": ""}) == "timeout"
    )


# ---------------------------------------------------------------------------
# sandbox
# ---------------------------------------------------------------------------


def test_agent_view_sanitized():
    # the agent view is FLATTENED like the reference's
    # (executor.py:253-262): pde/domain/bc/output top-level, oracle
    # discretization and exact solutions hidden
    spec = build_agent_case_spec(_case())
    assert "oracle_config" not in spec
    assert "mesh" not in spec and "fem" not in spec
    assert "oracle_solver" not in spec
    assert "manufactured_solution" not in spec["pde"]
    assert "source_term" in spec["pde"]  # agents still see the physics
    assert "domain" in spec and "bc" in spec and "output" in spec


def test_execute_agent_function_roundtrip(tmp_path):
    solver = tmp_path / "solver.py"
    solver.write_text(
        textwrap.dedent(
            """
            import numpy as np
            def solve(case_spec):
                grid = case_spec["output"]["grid"]
                u = np.zeros((grid["ny"], grid["nx"]))
                return {"u": u, "solver_info": {
                    "mesh_resolution": 32, "element_degree": 1,
                    "ksp_type": "cg", "pc_type": "jacobi", "rtol": 1e-8}}
            """
        )
    )
    out = tmp_path / "out"
    r = execute_agent_function(str(solver), str(out), _case(), timeout_sec=60)
    assert r.success, r.error_message
    u = np.load(out / "solution.npz")["u"]
    assert u.shape == (8, 8)


def test_execute_agent_function_bad_shape(tmp_path):
    solver = tmp_path / "solver.py"
    solver.write_text(
        "import numpy as np\n"
        "def solve(c):\n"
        "    return {'u': np.zeros((3, 3)), 'solver_info': {"
        "'mesh_resolution': 1, 'element_degree': 1, 'ksp_type': 'cg',"
        "'pc_type': 'none', 'rtol': 1e-8}}\n"
    )
    r = execute_agent_function(str(solver), str(tmp_path / "o"), _case(), timeout_sec=60)
    assert not r.success
    assert "shape" in r.error_message


def test_execute_agent_missing_solver_info(tmp_path):
    solver = tmp_path / "solver.py"
    solver.write_text(
        "import numpy as np\n"
        "def solve(c):\n"
        "    return {'u': np.zeros((8, 8)), 'solver_info': {}}\n"
    )
    r = execute_agent_function(str(solver), str(tmp_path / "o"), _case(), timeout_sec=60)
    assert not r.success
    assert "solver_info" in r.error_message or "missing" in r.error_message


def test_cpp_executor_roundtrip(tmp_path):
    code = r"""
    #include "pdebench_json.hpp"
    #include <cstdio>
    #include <string>
    #include <vector>
    int main(int argc, char** argv) {
        auto spec = pdebench::json::parse_file(argv[1]);
        auto& grid = spec["output"]["grid"];
        long nx = grid["nx"].int_or(0), ny = grid["ny"].int_or(0);
        std::vector<double> u(nx * ny, 1.5);
        std::string out = std::string(argv[2]) + "/solution_grid.bin";
        FILE* f = fopen(out.c_str(), "wb");
        fwrite(u.data(), sizeof(double), u.size(), f);
        fclose(f);
        FILE* m = fopen((std::string(argv[2]) + "/meta.json").c_str(), "w");
        fprintf(m, "{\"nx\": %ld, \"ny\": %ld, \"baseline_time\": 0.01}", nx, ny);
        fclose(m);
        return 0;
    }
    """
    ex = CppExecutor(build_dir=str(tmp_path / "build"))
    r = ex.execute(code, _case(), str(tmp_path / "out"), timeout_sec=120)
    assert r.success, r.error_message
    u = np.load(tmp_path / "out" / "solution.npz")["u"]
    assert u.shape == (8, 8) and np.all(u == 1.5)
    # second build hits the cache
    info = ex.build(code)
    assert info["cached"]


def test_cpp_executor_compile_error(tmp_path):
    ex = CppExecutor(build_dir=str(tmp_path / "build"))
    r = ex.execute("int main( {", _case(), str(tmp_path / "out"))
    assert not r.success
    assert "compile failed" in r.error_message


def test_oracle_runner_cli(tmp_path):
    """python -m pdebench_tpu.oracle.runner <spec> <outdir> writes
    reference.npy + meta.json (process-isolation entry)."""
    import subprocess
    import sys

    spec = {
        "pde": {"type": "poisson",
                "manufactured_solution": {"u": "sin(pi*x)*sin(pi*y)"}},
        "domain": {"type": "unit_square"},
        "mesh": {"resolution": 16},
        "fem": {"degree": 1},
        "bc": {"dirichlet": {"on": "all", "value": "0"}},
        "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 12, "ny": 12}},
        "oracle_solver": {"ksp_type": "cg", "pc_type": "jacobi", "rtol": 1e-9},
    }
    spec_path = tmp_path / "case.json"
    spec_path.write_text(json.dumps(spec))
    out = tmp_path / "out"
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import sys; from pdebench_tpu.oracle.runner import main;\n"
        f"sys.exit(main(['{spec_path}', '{out}']))"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    ref = np.load(out / "reference.npy")
    assert ref.shape == (12, 12)
    meta = json.load(open(out / "meta.json"))
    assert meta["success"] and meta["baseline_error"] < 5e-2
