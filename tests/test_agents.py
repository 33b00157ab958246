"""CodePDE-style wrapper: repeated sampling, internal candidate
evaluation against the oracle, and debug-message feedback — fully
offline through the mock LLM (reference: agents/codepde_wrapper.py:90-210,
487-574)."""

import textwrap

import numpy as np
import pytest

from pdebench_tpu.agents import get_agent
from pdebench_tpu.core import llm_client


def _case():
    return {
        "id": "toy_case",
        "oracle_config": {
            "pde": {"type": "poisson", "source_term": "0"},
            "domain": {"type": "unit_square"},
            "bc": {"dirichlet": {"on": "all", "value": "0"}},
            "output": {
                "grid": {"bbox": [0, 1, 0, 1], "nx": 8, "ny": 8},
            },
        },
        "evaluation_config": {"accuracy_tolerance": 10,
                              "time_tolerance": 3},
    }


def _oracle_info():
    ref = np.full((8, 8), 1.5)
    return {
        "error": 1e-4,
        "time": 1.0,
        "reference": [float(v) for v in ref.ravel()],
        "reference_shape": [8, 8],
    }


GOOD = textwrap.dedent(
    """
    ```python
    import numpy as np
    def solve(case_spec):
        g = case_spec["output"]["grid"]
        return {"u": np.full((g["ny"], g["nx"]), 1.5), "solver_info": {
            "mesh_resolution": 8, "element_degree": 1,
            "ksp_type": "cg", "pc_type": "jacobi", "rtol": 1e-8}}
    ```
    """
)

OFFBY = GOOD.replace("1.5", "1.2")  # executes, rel-L2 = 0.2

BROKEN = textwrap.dedent(
    """
    ```python
    def solve(case_spec):
        raise RuntimeError("kaboom")
    ```
    """
)

BAD_SHAPE = textwrap.dedent(
    """
    ```python
    import numpy as np
    def solve(case_spec):
        return {"u": np.zeros((3, 3)), "solver_info": {
            "mesh_resolution": 8, "element_degree": 1,
            "ksp_type": "cg", "pc_type": "jacobi", "rtol": 1e-8}}
    ```
    """
)


@pytest.fixture
def mock_responses(tmp_path, monkeypatch):
    def set_responses(*chunks):
        f = tmp_path / "responses.md"
        f.write_text("\n===NEXT===\n".join(chunks))
        monkeypatch.setenv("PDEBENCH_MOCK_RESPONSE_FILE", str(f))
        monkeypatch.setattr(llm_client, "_MOCK_CALL_COUNT", 0)

    return set_responses


def test_codepde_debug_feedback_recovers(mock_responses):
    """Broken -> bad-shape -> good: the internal eval rejects the first
    two and the feedback loop reaches the working candidate."""
    mock_responses(BROKEN, BAD_SHAPE, GOOD)
    agent = get_agent(
        "codepde",
        {"model": "mock", "num_repeated_samples": 1,
         "num_debugging_trials": 3, "eval_timeout_sec": 60},
    )
    resp = agent.generate_solution(
        "task", {"case_spec": _case(), "oracle_info": _oracle_info()}
    )
    assert resp.success
    assert "1.5" in resp.code
    assert resp.metadata["llm_calls"] == 3
    assert resp.metadata["candidates_evaluated"] == 3
    assert resp.metadata["internal_best_error"] == pytest.approx(0.0)


def test_codepde_selects_best_sample(mock_responses):
    """Two samples both execute; the one closer to the oracle wins."""
    mock_responses(OFFBY, GOOD)
    agent = get_agent(
        "codepde",
        {"model": "mock", "num_repeated_samples": 2,
         "num_debugging_trials": 1, "eval_timeout_sec": 60},
    )
    resp = agent.generate_solution(
        "task", {"case_spec": _case(), "oracle_info": _oracle_info()}
    )
    assert resp.success
    assert "1.5" in resp.code and "1.2" not in resp.code
    assert resp.metadata["internal_best_error"] < 1e-12


def test_codepde_degrades_without_oracle(mock_responses):
    """No context -> best-of-N sampling, no sandbox runs."""
    mock_responses(GOOD)
    agent = get_agent(
        "codepde", {"model": "mock", "num_repeated_samples": 2,
                    "num_debugging_trials": 3},
    )
    resp = agent.generate_solution("task")
    assert resp.success and "def solve" in resp.code
    assert resp.metadata["candidates_evaluated"] == 0
    assert resp.metadata["llm_calls"] == 2  # one per sample, no retries


def test_codepde_keeps_last_code_when_nothing_validates(mock_responses):
    mock_responses(BROKEN)
    agent = get_agent(
        "codepde",
        {"model": "mock", "num_repeated_samples": 1,
         "num_debugging_trials": 2, "eval_timeout_sec": 60},
    )
    resp = agent.generate_solution(
        "task", {"case_spec": _case(), "oracle_info": _oracle_info()}
    )
    assert resp.success  # degrades to the last sampled code
    assert "kaboom" in resp.code
    assert resp.metadata["internal_best_error"] is None


# --- native shell-agent loop (mini-swe / openhands fallback) ---------

SOLVER_BODY = (
    "import numpy as np\n"
    "def solve(case_spec):\n"
    "    g = case_spec['output']['grid']\n"
    "    return {'u': np.full((g['ny'], g['nx']), 1.5)}\n"
)

LS_TURN = "I'll look around first.\n```bash\nls\n```\n"
WRITE_TURN = (
    "Now write the solver.\n```bash\ncat > solver.py <<'PYEOF'\n"
    + SOLVER_BODY
    + "PYEOF\n```\n"
)
SUBMIT_TURN = "Done.\n```bash\necho SUBMIT_FINAL_ANSWER\n```\n"


def test_shell_loop_writes_and_submits(mock_responses):
    """ls -> heredoc-write solver.py -> submit; the loop reads back the
    workspace file and records the step count."""
    mock_responses(LS_TURN, WRITE_TURN, SUBMIT_TURN)
    agent = get_agent("mini-swe-agent", {"model": "mock", "max_steps": 5})
    resp = agent.generate_solution("task", {"case_spec": _case()})
    assert resp.success
    assert "def solve" in resp.code and "1.5" in resp.code
    assert resp.metadata["native_loop"] and resp.metadata["submitted"]
    assert resp.metadata["llm_calls"] == 3
    # the first observation (ls) saw the case_spec file in the workspace
    assert "case_spec.json" in resp.raw_response


def test_shell_loop_step_budget(mock_responses):
    """Never submits, never writes the solver -> clean failure."""
    mock_responses(LS_TURN)
    agent = get_agent("mini-swe-agent", {"model": "mock", "max_steps": 3})
    resp = agent.generate_solution("task")
    assert not resp.success
    assert "step budget exhausted" in resp.error_message
    assert resp.metadata["llm_calls"] == 3


def test_shell_loop_handles_missing_block(mock_responses):
    """A reply without a bash block costs a turn but does not crash."""
    mock_responses("thinking out loud, no command", WRITE_TURN, SUBMIT_TURN)
    agent = get_agent("openhands", {"model": "mock", "max_steps": 5})
    resp = agent.generate_solution("task", {"case_spec": _case()})
    assert resp.success and "def solve" in resp.code


def test_native_fallback_can_be_disabled(mock_responses):
    mock_responses(WRITE_TURN)
    agent = get_agent(
        "mini-swe-agent", {"model": "mock", "native_fallback": False}
    )
    resp = agent.generate_solution("task")
    assert not resp.success
    assert "not installed" in resp.error_message


# ---- real external-framework invocation boundary ------------------------
#
# The image has neither OpenHands nor mini-swe-agent installed, so the
# REAL invocation paths are exercised to the subprocess / API boundary
# with the binary mocked: command line, workspace layout, anti-cheat
# injection, and solver read-back (reference:
# agents/openhands_wrapper.py:30-48, mini_swe_agent_wrapper.py:19-37).


def test_openhands_real_invocation_boundary(monkeypatch):
    from pathlib import Path

    from pdebench_tpu.agents import wrappers

    seen = {}

    def fake_run(cmd, cwd=None, capture_output=None, text=None, timeout=None):
        seen["cmd"] = cmd
        seen["cwd"] = cwd
        seen["timeout"] = timeout
        # the framework writes the solver into its workspace
        (Path(cwd) / "solver.py").write_text("def solve(case_spec):\n    pass\n")

        class P:
            returncode = 0
            stdout = "done"
            stderr = ""

        return P()

    monkeypatch.setattr(wrappers.subprocess, "run", fake_run)
    monkeypatch.setattr(
        wrappers.OpenHandsAgent, "_framework_available", lambda self: True
    )
    agent = get_agent("openhands", {"model": "mock", "timeout_sec": 77})
    resp = agent.generate_solution("solve the PDE")
    assert seen["cmd"][:3] == ["openhands", "--headless", "-t"]
    task = seen["cmd"][3]
    assert task.startswith("solve the PDE")
    assert wrappers.ANTI_CHEAT_CONTRACT.strip() in task  # anti-cheat injected
    assert seen["timeout"] == 77.0
    assert seen["cwd"] is not None  # isolated tmp workspace
    assert resp.success and "def solve" in resp.code
    assert resp.metadata["agent"] == "openhands"


def test_openhands_no_solver_falls_back_to_stdout_code(monkeypatch):
    from pdebench_tpu.agents import wrappers

    def fake_run(cmd, cwd=None, capture_output=None, text=None, timeout=None):
        class P:
            returncode = 0
            stdout = "```python\ndef solve(case_spec):\n    return {}\n```"
            stderr = ""

        return P()

    monkeypatch.setattr(wrappers.subprocess, "run", fake_run)
    monkeypatch.setattr(
        wrappers.OpenHandsAgent, "_framework_available", lambda self: True
    )
    agent = get_agent("openhands", {"model": "mock"})
    resp = agent.generate_solution("task")
    assert resp.success and "def solve" in resp.code


def test_miniswe_real_invocation_boundary(monkeypatch):
    import sys
    import types
    from pathlib import Path

    from pdebench_tpu.agents import wrappers

    seen = {}

    def fake_run_task(task, cwd=None):
        seen["task"] = task
        seen["cwd"] = cwd
        Path(cwd) / "solver.py"
        (Path(cwd) / "solver.py").write_text("def solve(case_spec):\n    pass\n")

    pkg = types.ModuleType("minisweagent")
    runmod = types.ModuleType("minisweagent.run")
    runmod.run_task = fake_run_task
    pkg.run = runmod
    monkeypatch.setitem(sys.modules, "minisweagent", pkg)
    monkeypatch.setitem(sys.modules, "minisweagent.run", runmod)
    agent = get_agent("mini-swe-agent", {"model": "mock"})
    resp = agent.generate_solution("solve it")
    assert seen["task"].startswith("solve it")
    assert wrappers.ANTI_CHEAT_CONTRACT.strip() in seen["task"]
    assert seen["cwd"] is not None
    assert resp.success and "def solve" in resp.code
    assert resp.metadata["agent"] == "mini-swe-agent"


def test_miniswe_missing_solver_is_failure(monkeypatch):
    import sys
    import types

    def fake_run_task(task, cwd=None):
        pass  # framework ran but wrote nothing

    pkg = types.ModuleType("minisweagent")
    runmod = types.ModuleType("minisweagent.run")
    runmod.run_task = fake_run_task
    pkg.run = runmod
    monkeypatch.setitem(sys.modules, "minisweagent", pkg)
    monkeypatch.setitem(sys.modules, "minisweagent.run", runmod)
    agent = get_agent("mini-swe-agent", {"model": "mock"})
    resp = agent.generate_solution("task")
    assert not resp.success
    assert "no solver.py" in resp.error_message
