"""Out-of-process oracle entry:

    python -m pdebench_tpu.oracle.runner <case_spec.json> <outdir> [library]

Writes reference.npy + meta.json into outdir. Role parity with the
reference's in-container entry (pdebench/oracle/runner.py:36-69 — there
it ran inside the Firedrake/deal.II Docker images; here it provides the
same process isolation without containers, e.g. for driving oracles from
a separate interpreter or pinning them to a device).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    spec_path, outdir = Path(argv[0]), Path(argv[1])
    library = argv[2] if len(argv) > 2 else "jax"
    outdir.mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_enable_x64", True)

    from . import OracleSolver

    with open(spec_path) as f:
        spec = json.load(f)
    oracle_config = spec.get("oracle_config", spec)

    try:
        result = OracleSolver().solve(oracle_config, library)
    except Exception as e:  # structured failure for the host side
        with open(outdir / "meta.json", "w") as f:
            json.dump({"success": False, "error": f"{type(e).__name__}: {e}"}, f)
        return 1

    np.save(outdir / "reference.npy", np.asarray(result.reference))
    with open(outdir / "meta.json", "w") as f:
        json.dump(
            {
                "success": True,
                "baseline_error": result.baseline_error,
                "baseline_time": result.baseline_time,
                "num_dofs": result.num_dofs,
                "solver_info": result.solver_info,
            },
            f,
            default=str,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
