"""The generated-maps contract: solver_settings / parameter_map / model_map.

In the reference these three YAML files are the interface that lets the
C++ runtime address the generated solver by NAME without recompiling
(SURVEY.md §1 L3→L2: generate_solver.py:38-46 writes solver_settings,
util/parameters.py:69-74 the parameter map, solver_model.py:118-128 the
model map). In the TPU build the same name→index maps live on the
ParameterRegistry / DynamicsModel objects, so nothing at runtime reads
these files — but external tooling (dashboards, log decoders, the
reference's own rqt plots) consumes them, so we can emit byte-compatible
maps for any OCP.
"""

from __future__ import annotations

import os
from typing import Dict

from mpc_planner_tpu.solver.ocp import OCP


def solver_settings_map(ocp: OCP) -> Dict:
    """solver_settings.yaml content (ref generate_solver.py:38-46)."""
    return {
        "N": ocp.N,
        "nx": ocp.nx,
        "nu": ocp.nu,
        "nvar": ocp.nvar,
        "npar": ocp.npar,
        "nh": ocp.nh,
        "solver": "tpu-sqp",
    }


def parameter_map(ocp: OCP) -> Dict[str, int]:
    """parameter_map.yaml content: name -> flat per-stage index
    (ref util/parameters.py:69-74)."""
    return ocp.params.save_map()


def model_map(model) -> Dict:
    """model_map.yaml content: var -> [x|u, index, lb, ub]
    (ref solver_model.py:118-128)."""
    return model.save_map()


def save_solver_maps(directory: str, model, ocp: OCP) -> Dict[str, str]:
    """Write the three maps as YAML; returns {name: path}."""
    import yaml

    os.makedirs(directory, exist_ok=True)
    out = {}
    for name, data in (
        ("solver_settings", solver_settings_map(ocp)),
        ("parameter_map", parameter_map(ocp)),
        ("model_map", model_map(model)),
    ):
        path = os.path.join(directory, f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(data, f, default_flow_style=None)
        out[name] = path
    return out
