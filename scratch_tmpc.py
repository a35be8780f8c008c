import os, sys
if "--cpu" in sys.argv:
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    import jax
    jax.config.update('jax_platforms', 'cpu')

import time
import numpy as np
from mpc_planner_tpu.utils.config import default_config
from mpc_planner_tpu.presets import configuration_tmpc
from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.sim import ClosedLoopSimulator
from mpc_planner_tpu.sim.simulator import Pedestrian

cfg = default_config(N=20)
model, modules, = configuration_tmpc(cfg)
planner = Planner(model, modules, cfg)

rng = np.random.default_rng(3)
peds = []
for i in range(6):
    px = rng.uniform(5.0, 22.0)
    py = rng.uniform(-2.0, 2.0)
    peds.append(Pedestrian(
        position=np.array([px, py]),
        velocity=np.array([rng.uniform(-0.6, 0.3), rng.uniform(-0.8, 0.8)]),
        radius=0.4,
    ))

xs = np.linspace(0, 25, 14)
sim = ClosedLoopSimulator(planner, cfg, peds, {"x": xs, "y": np.zeros_like(xs)})

t0 = time.time()
res = sim.run(max_steps=150)
el = time.time() - t0
gmod = modules.get("GuidanceConstraints")
print(f"completed={res.completed} steps={res.steps} dur={res.duration:.1f}s "
      f"collisions={res.collisions} intrusion={res.max_intrusion:.3f} "
      f"infeasible={res.infeasible_cycles} mean_v={res.mean_velocity:.2f}", flush=True)
print(f"wall={el:.1f}s per-cycle={(el/max(res.steps,1))*1000:.0f}ms", flush=True)
from mpc_planner_tpu.utils.profiling import PROFILER
print(PROFILER.summary(), flush=True)
