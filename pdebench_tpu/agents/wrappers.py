"""Bundled agent wrappers.

Parity targets (reference: pdebench/agents/):
  - codepde_wrapper.py: imports the external CodePDE framework from a
    configured path, generates repeated samples with internal candidate
    evaluation + debug feedback
  - openhands_wrapper.py: drives the OpenHands CLI/SDK in a scratch
    workspace with an anti-cheating contract appended to the task
  - mini_swe_agent_wrapper.py: mini-swe-agent Python API in a tmp
    workspace, reads back solver.py

None of those frameworks ship in this image, so each wrapper degrades
with a clear error at generate time while staying registered (the
registry surface matches the reference: 'codepde', 'openhands',
'mini-swe-agent'). Two fully-functional wrappers are provided:
  - 'llm': one-shot LLM call through core.llm_client
  - 'script': run a user-supplied command that reads the prompt on
    stdin and prints solver code (hook for arbitrary local agents)
"""

from __future__ import annotations

import subprocess
import sys
from typing import Any, Dict, Optional

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


@register("codepde")
class CodePDEAgent(_ExternalFrameworkAgent):
    framework = "CodePDE"
    install_hint = "clone CodePDE and set config['framework_path']"

    def generate_solution(self, prompt, context=None) -> AgentResponse:
        try:
            import codepde  # noqa: F401
        except ImportError:
            return super().generate_solution(prompt, context)
        # repeated-sample generation with internal evaluation would be
        # driven here through the imported framework
        return super().generate_solution(prompt, context)


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
