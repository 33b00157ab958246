"""Tests for the prompting/LLM core and agent registry."""

import json

import pytest

from pdebench_tpu.agents import AgentRegistry, get_agent
from pdebench_tpu.core import (
    PRICING,
    SUPPORTED_AGENTS,
    call_llm,
    create_feedback_prompt,
    extract_code,
    generate_nl_description,
    generate_prompt,
)
from pdebench_tpu.core.llm_client import LLMError
from pdebench_tpu.core.multi_attempt import (
    analyze_improvement,
    run_with_attempts,
    select_best_attempt,
)


def _case(**pde_extra):
    pde = {
        "type": "convection_diffusion",
        "pde_params": {"epsilon": 0.01, "beta": [10.0, 10.0],
                       "stabilization": "supg"},
        "source_term": "1.0",
    }
    pde.update(pde_extra)
    return {
        "id": "case1",
        "pde_classification": {"math_type": ["mixed_type"]},
        "oracle_config": {
            "pde": pde,
            "domain": {"type": "unit_square"},
            "mesh": {"resolution": 160},
            "fem": {"degree": 1},
            "bc": {"dirichlet": {"on": "all", "value": "0"}},
            "oracle_solver": {"ksp_type": "gmres", "stabilization": "supg"},
            "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 50, "ny": 50}},
        },
        "evaluation_config": {
            "accuracy_tolerance": 10,
            "time_tolerance": 3,
            "timeout_sec": 300,
        },
        "agent_knobs": ["mesh_resolution (64-256)", "element_degree"],
    }


def test_prompt_contains_core_blocks():
    p = generate_prompt(_case(), {"error": 1e-4, "time": 2.0}, "jax")
    assert "SUPG" in p  # numerical warning for convection-dominated
    assert "(ny, nx)" in p  # output contract
    assert "solver_info" in p  # interface contract
    assert "1.000e-03" in p or "<= 1.0" in p or "accuracy" in p
    assert "mesh_resolution" in p
    # anchoring ranges stripped from knobs
    assert "(64-256)" not in p
    # pass criteria derived from the oracle baseline
    assert f"{max(1e-4 * 10, 1e-6):.3e}" in p
    assert "6.00 s" in p


def test_prompt_cpp_contract():
    p = generate_prompt(_case(), None, "cpp")
    assert "solution_grid.bin" in p and "pdebench_json.hpp" in p


def test_nl_description_callouts():
    d = generate_nl_description(_case())
    assert "convection" in d and "dominated" in d


def test_extract_code():
    text = "Here you go:\n```python\nprint(1)\n```\nand a note"
    assert extract_code(text) == "print(1)"
    assert extract_code("no fences at all") == "no fences at all"


def test_registry_and_mock_llm():
    assert SUPPORTED_AGENTS["mock"][0] == "mock"
    code, meta = call_llm("mock", "solve it")
    assert "def solve" in code
    assert meta["cost_usd"] == 0.0
    with pytest.raises(LLMError):
        call_llm("no-such-model", "x")
    for name in ("llm", "script", "codepde", "openhands", "mini-swe-agent"):
        assert AgentRegistry.is_registered(name)
    agent = get_agent("llm", {"model": "mock"})
    resp = agent.generate_solution("prompt")
    assert resp.success and "def solve" in resp.code


def test_feedback_prompt_stages():
    base = "ORIGINAL TASK"
    fb = create_feedback_prompt(
        base,
        {"code": "x = 1", "failure_stage": "accuracy", "error": 0.5,
         "target_error": 1e-3},
        {"target_error": 1e-3, "target_time": 2.0},
    )
    assert "NOT ACCURATE" in fb and "ORIGINAL TASK" in fb and "x = 1" in fb
    fb = create_feedback_prompt(
        base, {"code": "", "failure_stage": "exec",
               "error_message": "boom", "stderr": "trace"}, {}
    )
    assert "FAILED TO EXECUTE" in fb and "boom" in fb


def test_multi_attempt_loop():
    calls = []

    def generate(prompt):
        calls.append(prompt)
        return f"code{len(calls)}"

    def execute(code):
        if code == "code3":
            return {"status": "PASS", "error": 1e-5, "time": 1.0}
        return {"status": "FAIL", "error": 0.5, "failure_stage": "accuracy"}

    out = run_with_attempts("task", generate, execute, max_attempts=5)
    assert out["passed"] and out["best_index"] == 2
    assert len(out["attempts"]) == 3
    # later prompts carry feedback
    assert "task" in calls[1] and "NOT ACCURATE" in calls[1]
    imp = analyze_improvement(out["attempts"])
    assert imp["passed_at"] == 3


def test_select_best_attempt():
    assert select_best_attempt([{"status": "FAIL", "error": 0.5},
                                {"status": "FAIL", "error": 0.1}]) == 1
    assert select_best_attempt([{"status": "FAIL"}, {"status": "FAIL"}]) == 1
    assert select_best_attempt([{"status": "PASS"}, {"status": "FAIL"}]) == 0
