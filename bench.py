"""Benchmark: SpMV throughput (the BASELINE.json north star) + end-to-end
projection-step throughput on the flagship TGV model.

Prints ONE JSON line:
  {"metric": "spmv_nnz_per_s", "value": ..., "unit": "nnz/s",
   "vs_baseline": achieved / (0.8 * HBM-roofline nnz/s), ...extras}

The reference publishes no wall-clock numbers (BASELINE.md); the performance
bar is >=80% of HBM roofline for SpMV nnz/s per chip.  Roofline model for the
ELL SpMV: per nnz we move vals(4B) + idx(4B) + gathered x(4B) = 12 B minimum
from HBM (mask folded into vals; diag amortized), so
roofline_nnz_s = HBM_BW / 12.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache cuts repeat-run compile time dramatically
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

# HBM bandwidth per chip (bytes/s): TPU v5e ~ 819 GB/s
HBM_BW = {"tpu v5": 819e9, "tpu v4": 1200e9, "cpu": 50e9}


def _hbm_bw():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for k, v in HBM_BW.items():
        if k in kind:
            return v
    return HBM_BW["cpu"]


def bench_spmv(n_lattice=256, max_neighbors=32, n1=200, n2=2400):
    from isph_tpu.models import tgv
    from isph_tpu.ops import corrected as ops
    from isph_tpu.ops.corrected import PairFilter, SYMMETRIC
    from isph_tpu.state import Kind

    _log(f"spmv: building n_lattice={n_lattice}")
    # K=32 covers the TGV neighbor max (28) without dead slot-groups; the
    # per-rank chunk widths (5,5,6,3) are the measured maxima for the
    # column-sorted lattice lists (plan overflow is asserted below)
    sim, state = tgv.make_tgv(
        n_lattice, dtype=jnp.float32, max_neighbors=max_neighbors, pad_multiple=128,
        gather_chunks=(5, 5, 6, 3),
    )
    nbrs = jax.jit(sim.neighbors)(state)
    assert int(nbrs.overflow) == 0, "neighbor overflow in bench"
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)

    # NOTE: large arrays must be ARGUMENTS of jitted functions, never closures
    # — closed-over concrete arrays are embedded as constants in the HLO.
    def build(geom, pre, state):
        return ops.laplacian_matrix(
            geom, pre.vfrac, pre.Gc, pre.Lc, state.kind,
            alpha=-sim.cfg.dt, material=1.0 / state.rho,
            filt=PairFilter(Kind.FLUID, Kind.FLUID), family=SYMMETRIC,
        )

    A = jax.jit(build)(geom, pre, state)
    jax.block_until_ready(A.vals)
    _log("spmv: assembled, compiling matvec scans")

    def many_matvec(iters):
        @jax.jit
        def f(A, x):
            def body(x, _):
                y = A.matvec(x)
                # normalize to keep values finite over many iterations
                y = y / jnp.maximum(jnp.sqrt((y * y).sum()), 1e-30)
                return y, None
            y, _ = jax.lax.scan(body, x, None, length=iters)
            return y
        return f

    # TIMING METHODOLOGY (remote-TPU tunnel): (a) every host<->device round
    # trip through the tunnel costs ~24 ms regardless of the work (measured:
    # a tiny-op sync and a 4096^2 matmul both take ~25 ms wall), so the
    # throughput is taken as the SLOPE between two scan lengths — the fixed
    # tunnel latency cancels exactly; (b) the runtime can memoize repeat
    # executions, so every timed run uses a FRESH host-built input and is
    # synced by a host transfer of a scalar reduction (float()); (c) the
    # minimum over reps filters tunnel queue jitter.
    f1, f2 = many_matvec(n1), many_matvec(n2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(state.n), jnp.float32)
    float(f1(A, x).sum())
    float(f2(A, x).sum())  # warmup/compile

    def slope_time(mk_input, per_unit):
        """min over reps of the two-point slope, POSITIVE slopes only —
        tunnel-latency jitter between the two legs can exceed the short
        leg's work and produce garbage (even negative) slopes."""
        best = float("inf")
        good = 0
        for rep in range(8):
            a = mk_input(rep)
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            float(f1(A, a).sum())
            t1 = time.perf_counter()
            float(f2(A, a).sum())
            t2 = time.perf_counter()
            s = ((t2 - t1) - (t1 - t0)) / per_unit
            if s > 0:
                best = min(best, s)
                good += 1
                if good >= 4:
                    break
        if best == float("inf"):
            # degenerate tunnel behavior: report the long leg inclusive of
            # the fixed round trip (an upper bound, never negative)
            a = mk_input(99)
            t0 = time.perf_counter()
            float(f2(A, a).sum())
            best = (time.perf_counter() - t0) / n2
        return best

    dt = slope_time(
        lambda r: jnp.asarray(
            np.random.default_rng(r).standard_normal(state.n), jnp.float32),
        n2 - n1,
    )
    _log(f"spmv: best {dt*1e6:.2f} us / matvec (slope over {n2-n1} iters)")

    nnz = float(np.asarray(geom.mask).sum() + state.n)  # offdiag + diag
    nnz_per_s = nnz / dt

    # fused 2-RHS multivector SpMV (the Helmholtz dim-RHS path,
    # pair_isph.cpp:936): components share the vals/enc streams
    xm = jnp.stack([x, x * 0.5 + 1.0])
    float(f1(A, xm).sum()); float(f2(A, xm).sum())
    dtm = slope_time(
        lambda r: jnp.asarray(
            np.random.default_rng(100 + r).standard_normal((2, state.n)),
            jnp.float32),
        n2 - n1,
    )
    _log(f"spmv 2-RHS: best {dtm*1e6:.2f} us / matvec")
    return nnz_per_s, nnz, dt, 2.0 * nnz / dtm


def bench_step(n_lattice=128, max_neighbors=32, precond="jacobi", s1=1, s2=6):
    import dataclasses
    from isph_tpu.models import tgv

    # uniform chunk width 8 leaves margin for particle drift during the run
    # (re-neighboring happens inside every step)
    sim, state = tgv.make_tgv(
        n_lattice, dtype=jnp.float32, max_neighbors=max_neighbors, pad_multiple=128,
        gather_chunks=8,
    )
    cfg = sim.cfg.replace(solver=dataclasses.replace(sim.cfg.solver, precond=precond))
    sim = dataclasses.replace(sim, cfg=cfg)

    def make_nsteps(steps):
        @jax.jit
        def nsteps(state):
            def body(s, _):
                s2, aux = sim.step(s)
                return s2, aux.status.vmax
            return jax.lax.scan(body, state, None, length=steps)
        return nsteps

    _log(f"step[{precond}]: compiling full step n_lattice={n_lattice}")
    f1, f2 = make_nsteps(s1), make_nsteps(s2)
    out, vmax = f2(state)
    float(out.x.sum())
    out, _ = f1(state)
    float(out.x.sum())  # warmup/compile; host transfer forces completion
    _log(f"step[{precond}]: compiled, timing")
    # slope timing: fixed ~24 ms tunnel round trip cancels (see bench_spmv);
    # POSITIVE slopes only — tunnel jitter can exceed the short leg's work
    # and produce garbage (even negative) slopes
    dt = float("inf")
    good = 0
    for rep in range(1, 9):
        state2 = state.replace(v=state.v * (1.0 + 1e-4 * rep))
        float(state2.v.sum())  # materialize input before the clock starts
        t0 = time.perf_counter()
        out, _ = f1(state2)
        float(out.x.sum())
        t1 = time.perf_counter()
        out, vmax = f2(state2)
        float(out.x.sum())
        t2 = time.perf_counter()
        s = ((t2 - t1) - (t1 - t0)) / (s2 - s1)
        if s > 0:
            dt = min(dt, s)
            good += 1
            if good >= 3:
                break
    if dt == float("inf"):
        t0 = time.perf_counter()
        out, vmax = f2(state)
        float(out.x.sum())
        dt = (time.perf_counter() - t0) / s2  # upper bound incl. round trip
    _log(f"step[{precond}]: best {dt:.3f} s / step")
    particle_steps_per_s = state.n / dt
    return particle_steps_per_s, dt, float(np.asarray(vmax)[-1])


def _device_alive(timeout_s: int = 120) -> bool:
    """Probe the default device in a SUBPROCESS with a hard timeout — a
    wedged TPU tunnel hangs inside C++ where in-process signals can't
    interrupt."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.block_until_ready(jax.numpy.ones(8) + 1)"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_benches(small: bool) -> str:
    if small:
        spmv_nnz_s, nnz, spmv_t, mv2 = bench_spmv(n_lattice=128, n1=50, n2=250)
        ps_j, step_j, vmax_j = bench_step(n_lattice=64, precond="jacobi")
        ps_a, step_a, vmax_a = bench_step(n_lattice=64, precond="amg")
    else:
        spmv_nnz_s, nnz, spmv_t, mv2 = bench_spmv()
        ps_j, step_j, vmax_j = bench_step(precond="jacobi")
        # AMG is the production preconditioner (reference: ML on every solve,
        # precond_ml.h) — benched on TPU, not excluded (VERDICT r2 ask #1e)
        ps_a, step_a, vmax_a = bench_step(precond="amg")
    if step_a <= step_j:
        ps_per_s, step_t, vmax, best = ps_a, step_a, vmax_a, "amg"
    else:
        ps_per_s, step_t, vmax, best = ps_j, step_j, vmax_j, "jacobi"
    roofline = _hbm_bw() / 12.0
    target = 0.8 * roofline
    return json.dumps(
        {
            "metric": "spmv_nnz_per_s",
            "value": spmv_nnz_s,
            "unit": "nnz/s",
            "vs_baseline": spmv_nnz_s / target,
            "extras": {
                "matrix_nnz": nnz,
                "roofline_nnz_per_s": roofline,
                "spmv_2rhs_nnz_per_s": mv2,
                "tgv2d_particle_steps_per_s": ps_per_s,
                "tgv2d_step_seconds": step_t,
                "tgv2d_step_seconds_amg": step_a,
                "tgv2d_step_seconds_jacobi": step_j,
                "tgv2d_best_precond": best,
                "tgv2d_vmax": vmax,
                "device": str(jax.devices()[0]),
            },
        }
    )


def main():
    """Watchdogged: the TPU tunnel can hang indefinitely inside C++ (device
    faults, remote-compile stalls), so the TPU attempt runs in a subprocess
    with a hard timeout; any failure falls back to a CPU run so the round
    always records a benchmark row."""
    import subprocess
    import sys

    if "--inner" in sys.argv:
        print(_run_benches(small=False), flush=True)
        return
    if "--inner-cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        print(_run_benches(small=True), flush=True)
        return

    me = os.path.abspath(__file__)
    if _device_alive():
        try:
            r = subprocess.run(
                [sys.executable, me, "--inner"], timeout=1500,
                capture_output=True, text=True,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if r.returncode == 0 and line:
                print(line[-1])
                return
            _log(f"tpu bench failed rc={r.returncode}: {r.stderr[-300:] if r.stderr else ''}")
        except subprocess.TimeoutExpired:
            _log("tpu bench timed out; falling back to cpu")
    r = subprocess.run(
        [sys.executable, me, "--inner-cpu"], timeout=1500,
        capture_output=True, text=True,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    print(line[-1] if line else json.dumps({"metric": "spmv_nnz_per_s", "value": 0.0,
                                            "unit": "nnz/s", "vs_baseline": 0.0,
                                            "extras": {"error": "bench failed"}}))


if __name__ == "__main__":
    main()
