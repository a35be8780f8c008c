"""Benchmark: batched T-MPC++-scene MPC solves on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric per BASELINE.md: MPC solves/sec/chip at N=20 on the Jackal
T-MPC++ corridor scene (contouring + guidance/ellipsoid constraints,
12 obstacles), 10 SQP-RTI iterations per solve — the reference's
per-cycle workload (settings.yaml iterations: 10).

Measurement semantics: CYCLES control cycles are chained ON DEVICE
inside one jit (each cycle's solution trajectory and converged QP duals
warm-start the next, exactly the reference's 20 Hz steady state:
shift-forward warmstart + HPIPM warm_start=2 carried across cycles,
acados_solver_interface.cpp:274-376), and the wall time of the chain is
divided by CYCLES. This measures what the chip sustains per control
cycle. Per-solve time is shape-static (fixed RTI x IP iteration
counts), so chaining does not make the workload easier — it only keeps
the measurement off the dev-tunnel's per-dispatch latency, which in
this environment swings a single dispatch by tens of ms between
sessions (docs/PERF_NOTES.md "Absolute timings drift"). The
dispatch-inclusive single-call number is printed to stderr alongside.

Baseline: the reference runs 5 parallel planners at 20-30 Hz on CPU
(README.md:52, guidance_planner.yaml n_paths=4 + T-MPC++), i.e. ~100-150
full MPC solves/sec. vs_baseline uses 150 solves/sec (the generous end).
"""

import json
import sys
import time

import numpy as np

BASELINE_SOLVES_PER_SEC = 150.0  # 5 planners x 30 Hz (reference, CPU)
BATCH = 1024  # first compile ~5 min through the dev tunnel, steady ~34 ms
REPS = 10
CYCLES = 8  # control cycles chained on device per timed dispatch
RTI_ITERATIONS = 10


PEAK_FLOPS_BF16 = 197e12  # TPU v5e MXU peak (bf16); f32 "highest" is lower


def _kernel_flops_per_solve(ocp, cfg) -> float:
    """Analytic FLOP count of the in-kernel IP-Riccati work for ONE
    solve (the Pallas kernel body is opaque to XLA's cost model).

    Leading terms per stage per IP iteration, counting multiply+add as
    2 FLOPs: the Gauss-Newton Hessian contribution J^T Sigma J over the
    `nrows` inequality rows (2*nrows*nvar^2), the Riccati block products
    A'PA / A'PB / B'PB + the nu-block Cholesky (~6*nvar^3), and the
    barrier/residual row work (~12*nrows*nvar). Mehrotra's
    predictor-corrector reuses the factorization for a second RHS
    (x1.5). Warm QPs run max(6, qp_iterations*2//3) IP iterations
    (solver/sqp.py); the steady-state chain is all-warm.
    """
    nvar, nx, nu, N = ocp.nvar, ocp.nx, ocp.nu, ocp.N
    nrows = ocp.nh + 2 * nvar  # module rows + variable bounds
    qp_iters = max(6, cfg.solver.qp_iterations * 2 // 3)
    per_stage = 1.5 * (
        2.0 * nrows * nvar**2 + 6.0 * nvar**3 + 12.0 * nrows * nvar
    )
    return float(cfg.solver.iterations * qp_iters * (N + 1) * per_stage)


def main():
    from __graft_entry__ import _build
    from mpc_planner_tpu.utils.config import default_config

    cfg = default_config(N=20)
    model, ocp, solver, Z0, P, xinit = _build(cfg)

    rng = np.random.default_rng(0)
    Z0b = np.tile(Z0[None], (BATCH, 1, 1)).astype(np.float32)
    # Perturb warmstarts like distinct homotopy guesses
    Z0b[:, 1:, model.nu :] += rng.normal(0, 0.05, Z0b[:, 1:, model.nu :].shape).astype(
        np.float32
    )
    Pb = np.tile(P[None], (BATCH, 1, 1)).astype(np.float32)
    xb = np.tile(xinit[None], (BATCH, 1)).astype(np.float32)

    import jax
    import jax.numpy as jnp

    # Pre-stage on device: the axon tunnel used in this environment makes
    # host->device transfers ~100x slower than real PCIe/ICI; staging
    # isolates chip throughput (on hardware the 11MB parameter upload
    # costs ~1ms/cycle).
    Z0b = jax.device_put(jnp.asarray(Z0b))
    Pb = jax.device_put(jnp.asarray(Pb))
    xb = jax.device_put(jnp.asarray(xb))

    # Warm up / compile the cold path; report feasibility from it.
    res = solver.solve_batch(Z0b, Pb, xb, num_iterations=RTI_ITERATIONS)
    jax.block_until_ready(res)
    n_success = int(np.sum(np.asarray(res.exit_code) == 1))
    print(f"# warmup: {n_success}/{BATCH} feasible", file=sys.stderr)

    # Steady-state control loop chained on device: cycle k+1 warm-starts
    # from cycle k's trajectory and converged duals (data-dependent
    # carry — XLA cannot elide or overlap the chained solves).
    @jax.jit
    def run_cycles(Z0, ll0, lu0, ok0):
        def cycle(carry, _):
            Z, ll, lu, ok = carry
            r = solver.batch_impl(
                Z, Pb, xb, RTI_ITERATIONS, warm0=(ll, lu, ok)
            )
            return (r.Z, r.lam_l, r.lam_u, r.exit_code == 1), r.exit_code

        carry, codes = jax.lax.scan(
            cycle, (Z0, ll0, lu0, ok0), None, length=CYCLES
        )
        return carry, codes

    warm0 = (res.Z, res.lam_l, res.lam_u, res.exit_code == 1)
    out = run_cycles(*warm0)
    jax.block_until_ready(out)

    # FLOP accounting (VERDICT r3 #4): XLA's own cost model for the
    # chained-cycle program. The Pallas kernel's FLOPs are invisible to
    # this analysis, so add an analytic count of the IP-Riccati work
    # (docs/PERF_NOTES.md "Roofline position" derives the formula).
    flops_per_solve = None
    try:
        ca = run_cycles.lower(*warm0).compile().cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        xla_flops = float(ca.get("flops", 0.0))
    except Exception:
        xla_flops = 0.0
    flops_per_solve = (
        xla_flops / (CYCLES * BATCH) + _kernel_flops_per_solve(ocp, cfg)
    )

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run_cycles(*warm0)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / CYCLES)
    times = np.asarray(times)
    codes = np.asarray(out[1])
    feas_steady = int(np.sum(codes[-1] == 1))

    # Dispatch-inclusive single-call latency for reference
    t0 = time.perf_counter()
    r1 = solver.solve_batch(Z0b, Pb, xb, num_iterations=RTI_ITERATIONS)
    jax.block_until_ready(r1)
    t_single = time.perf_counter() - t0

    solves_per_sec = BATCH / float(np.mean(times))
    p99_ms = float(np.percentile(times, 99) * 1e3)
    achieved_flops = solves_per_sec * flops_per_solve
    pct_peak = 100.0 * achieved_flops / PEAK_FLOPS_BF16
    print(
        f"# batch={BATCH} cycle mean={np.mean(times)*1e3:.1f}ms "
        f"p99={p99_ms:.1f}ms rti={RTI_ITERATIONS} "
        f"steady feasible={feas_steady}/{BATCH} "
        f"(single dispatch incl. tunnel: {t_single*1e3:.1f}ms)",
        file=sys.stderr,
    )
    print(
        f"# roofline: ~{flops_per_solve/1e6:.1f} MFLOP/solve "
        f"(XLA cost model + analytic kernel count) -> "
        f"{achieved_flops/1e12:.3f} TFLOP/s = {pct_peak:.2f}% of v5e bf16 "
        f"peak; the solve is LATENCY-bound (serial Riccati recurrence, "
        f"~310 ns/stage-step, docs/PERF_NOTES.md), not FLOP-bound",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "tmpc_solves_per_sec_per_chip",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 2),
                "flops_per_solve": round(flops_per_solve),
                "pct_of_peak_bf16": round(pct_peak, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
