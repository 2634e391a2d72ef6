"""Model registry: the solver family, re-exported under the conventional
``models`` name. Each "model" is a pressure-solver step function over the
shared particle state (see sph_project_tpu/solvers/)."""
from ..solvers import common, dfsph, iisph, pbf, pcisph, viscosity_cg, wcsph  # noqa: F401
from ..sim import Simulation, get_step_fn, prepare  # noqa: F401

SOLVERS = {
    "wcsph": wcsph.step,
    "dfsph": dfsph.step,
    "pcisph": pcisph.step,
    "iisph": iisph.step,
    "pbf": pbf.step,
}
