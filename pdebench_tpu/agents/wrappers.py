"""Bundled agent wrappers.

Parity targets (reference: pdebench/agents/):
  - codepde_wrapper.py: repeated-sample generation with INTERNAL
    candidate evaluation (sandbox run + rel-L2 vs the oracle) and
    debug-message feedback between trials (:90-210, :487-540). Rebuilt
    natively here — the loop is the value, not the external framework,
    so 'codepde' is fully functional offline (any llm_client model,
    incl. the mock).
  - openhands_wrapper.py: drives the OpenHands CLI/SDK in a scratch
    workspace with an anti-cheating contract appended to the task
  - mini_swe_agent_wrapper.py: mini-swe-agent Python API in a tmp
    workspace, reads back solver.py

The OpenHands / mini-swe frameworks don't ship in this image, so those
two degrade with a clear error at generate time while staying
registered. Two more fully-functional wrappers are provided:
  - 'llm': one-shot LLM call through core.llm_client
  - 'script': run a user-supplied command that reads the prompt on
    stdin and prints solver code (hook for arbitrary local agents)
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from ..core.llm_client import LLMError, call_llm
from .agent_registry import register
from .base_agent import AgentResponse, BaseAgent

ANTI_CHEAT_CONTRACT = """
IMPORTANT CONSTRAINTS:
- Work ONLY inside the provided workspace directory.
- Do NOT read files outside the workspace (no oracle sources, no cached
  reference solutions, no benchmark data files).
- Do NOT attempt to recover or reverse-engineer the reference solver.
- Produce a single self-contained solver file as instructed.
"""


@register("llm")
class LLMAgent(BaseAgent):
    """One-shot LLM call; config: {'model': <SUPPORTED_AGENTS key>}."""

    def generate_solution(self, prompt, context=None) -> AgentResponse:
        model = self.config.get("model", "mock")
        try:
            code, meta = call_llm(model, prompt)
            return AgentResponse(code=code, raw_response=code, metadata=meta)
        except LLMError as e:
            return AgentResponse(code="", success=False, error_message=str(e))


@register("script")
class ScriptAgent(BaseAgent):
    """Run a local command as the agent: prompt on stdin, code on stdout.

    config: {'command': [argv...], 'timeout_sec': 600}
    """

    def generate_solution(self, prompt, context=None) -> AgentResponse:
        cmd = self.config.get("command")
        if not cmd:
            return AgentResponse(
                code="", success=False,
                error_message="script agent needs config['command']",
            )
        try:
            proc = subprocess.run(
                cmd,
                input=prompt,
                capture_output=True,
                text=True,
                timeout=float(self.config.get("timeout_sec", 600)),
            )
        except Exception as e:
            return AgentResponse(code="", success=False, error_message=str(e))
        if proc.returncode != 0:
            return AgentResponse(
                code="",
                success=False,
                error_message=f"agent command failed: {proc.stderr[-500:]}",
            )
        from ..core.llm_client import extract_code

        return AgentResponse(
            code=extract_code(proc.stdout), raw_response=proc.stdout
        )


class _ExternalFrameworkAgent(BaseAgent):
    framework = "?"
    install_hint = "?"

    def _setup(self):
        path = self.config.get("framework_path")
        if path:
            sys.path.insert(0, str(path))

    def generate_solution(self, prompt, context=None) -> AgentResponse:
        return AgentResponse(
            code="",
            success=False,
            error_message=(
                f"the external '{self.framework}' framework is not installed "
                f"in this environment ({self.install_hint}); configure "
                "'framework_path' or use the 'llm'/'script' agents"
            ),
        )


def _debug_feedback(prompt: str, code: str, eval_result: Dict[str, Any]) -> str:
    """Debug message appended between trials (reference
    codepde_wrapper.py:464-476 _build_debug_message)."""
    parts = [
        prompt,
        "\n---\nThe previous code failed to run or produced invalid "
        "results. Fix the issues and return a FULL, runnable script "
        "only. solve(case_spec) must return {'u': grid, 'solver_info': "
        "{...}} with the exact output-grid shape.",
    ]
    if eval_result.get("error_message"):
        parts.append(f"\nError message:\n{eval_result['error_message']}")
    if eval_result.get("stderr"):
        parts.append(f"\nStderr (tail):\n{eval_result['stderr'][-2000:]}")
    if eval_result.get("error") is not None:
        parts.append(
            f"\nAchieved rel-L2 error: {eval_result['error']:.3e} "
            "(reduce it below the target)"
        )
    parts.append(f"\nPrevious code:\n```python\n{code[:2000]}\n```")
    return "\n".join(parts)


@register("codepde")
class CodePDEAgent(BaseAgent):
    """CodePDE-style repeated sampling with internal candidate
    evaluation + debug feedback, rebuilt natively (reference:
    agents/codepde_wrapper.py:90-210, 487-574).

    config:
      model                 llm_client model key (default 'mock')
      num_repeated_samples  outer samples (default 3)
      num_debugging_trials  feedback retries per sample (default 3)
      evaluate_candidates   internal sandbox eval on/off (default True)
      eval_timeout_sec      per-candidate sandbox timeout (default 120)

    generate_solution(prompt, context) expects context to carry
    'case_spec' (the full case record) and 'oracle_info' (with
    'reference'/'reference_shape' and 'error') for the internal
    evaluation; without them it degrades to best-of-N sampling.
    """

    def generate_solution(self, prompt, context=None) -> AgentResponse:
        model = self.config.get("model", "mock")
        n_samples = int(self.config.get("num_repeated_samples", 3))
        n_trials = int(self.config.get("num_debugging_trials", 3))
        evaluate = bool(self.config.get("evaluate_candidates", True))
        timeout = float(self.config.get("eval_timeout_sec", 120))

        context = context or {}
        case_spec = context.get("case_spec")
        oracle_info = context.get("oracle_info")
        can_eval = evaluate and case_spec is not None and oracle_info

        best: Optional[Dict[str, Any]] = None
        last_code, last_raw = "", ""
        n_calls, n_evaluated = 0, 0
        cost = 0.0

        for _sample in range(n_samples):
            p = prompt
            for trial in range(n_trials):
                try:
                    code, meta = call_llm(model, p)
                except LLMError as e:
                    if best is not None or last_code:
                        break
                    return AgentResponse(
                        code="", success=False, error_message=str(e)
                    )
                n_calls += 1
                cost += float((meta or {}).get("cost_usd", 0.0))
                last_code, last_raw = code, code

                if not can_eval:
                    # best-of-N without an oracle: keep the longest
                    # non-empty candidate (reference :121-134 semantics)
                    score = len(code.strip())
                    if best is None or score > best.get("_score", -1):
                        best = {"code": code, "error": None, "_score": score}
                    break

                ev = self._evaluate_candidate(code, case_spec, timeout,
                                              oracle_info)
                n_evaluated += 1
                if ev["success"] and ev["error"] is not None:
                    if best is None or (
                        best.get("error") is None
                        or ev["error"] < best["error"]
                    ):
                        best = {"code": code, "error": ev["error"]}
                    break  # this sample produced a working candidate
                if trial < n_trials - 1:
                    p = _debug_feedback(prompt, code, ev)

        if best is None:
            if not last_code:
                return AgentResponse(
                    code="",
                    success=False,
                    error_message="codepde: no candidate produced",
                )
            best = {"code": last_code, "error": None}

        return AgentResponse(
            code=best["code"],
            raw_response=last_raw,
            metadata={
                "agent": "codepde",
                "model": model,
                "llm_calls": n_calls,
                "candidates_evaluated": n_evaluated,
                "internal_best_error": best.get("error"),
                "cost_usd": cost,
            },
        )

    @staticmethod
    def _evaluate_candidate(
        code: str,
        case_spec: Dict[str, Any],
        timeout: float,
        oracle_info: Dict[str, Any],
    ) -> Dict[str, Any]:
        """Sandbox-run a candidate and score it against the oracle
        reference (reference codepde_wrapper.py:487-540)."""
        from ..sandbox.executor import execute_agent_function

        with tempfile.TemporaryDirectory() as tmp:
            solver = Path(tmp) / "solver.py"
            solver.write_text(code)
            outdir = Path(tmp) / "agent_output"
            er = execute_agent_function(
                str(solver), str(outdir), case_spec, timeout_sec=timeout
            )
            if not er.success:
                return {
                    "success": False,
                    "error": None,
                    "stderr": er.stderr,
                    "error_message": er.error_message,
                }
            err = _rel_l2_vs_reference(outdir, oracle_info)
            if err is None or not np.isfinite(err):
                return {
                    "success": False,
                    "error": None,
                    "stderr": er.stderr,
                    "error_message": "error computation failed "
                    "(shape mismatch or non-finite values)",
                }
            return {"success": True, "error": float(err), "stderr": ""}


def _rel_l2_vs_reference(
    outdir: Path, oracle_info: Dict[str, Any]
) -> Optional[float]:
    """NaN-masked rel-L2 vs the oracle reference, strict shape (same
    semantics as the driver's compute_error)."""
    try:
        u = np.load(Path(outdir) / "solution.npz")["u"]
    except Exception:
        return None
    ref = oracle_info.get("reference")
    shape = oracle_info.get("reference_shape")
    if ref is None:
        return None
    ref = np.asarray(
        [np.nan if v is None else float(v) for v in np.ravel(ref)]
    )
    if shape:
        ref = ref.reshape(shape)
    if tuple(u.shape) != tuple(ref.shape):
        return None
    m = ~np.isnan(ref)
    if not m.any():
        return None
    diff = np.where(m, u - ref, 0.0)
    nref = float(np.linalg.norm(ref[m]))
    nd = float(np.linalg.norm(diff[m]))
    return nd / nref if nref > 1e-15 else nd


@register("openhands")
class OpenHandsAgent(_ExternalFrameworkAgent):
    framework = "OpenHands"
    install_hint = "pip install openhands-ai (not available offline)"

    def generate_solution(self, prompt, context=None) -> AgentResponse:
        task = prompt + "\n" + ANTI_CHEAT_CONTRACT
        import shutil

        if shutil.which("openhands") is None:
            return super().generate_solution(task, context)
        return super().generate_solution(task, context)


@register("mini-swe-agent")
class MiniSweAgent(_ExternalFrameworkAgent):
    framework = "mini-swe-agent"
    install_hint = "pip install mini-swe-agent (not available offline)"

    def generate_solution(self, prompt, context=None) -> AgentResponse:
        try:
            import minisweagent  # noqa: F401
        except ImportError:
            return super().generate_solution(
                prompt + "\n" + ANTI_CHEAT_CONTRACT, context
            )
        return super().generate_solution(prompt, context)
