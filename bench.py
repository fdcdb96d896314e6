"""Benchmark suite: per-kernel and end-to-end throughput on the current
accelerator (BASELINE.md items 3-4).

Prints one JSON line per metric:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
The LAST line is the headline metric: sustained throughput of the
dispatched Pallas stripe-tiled llin4 relaxation kernel — the hot sweep of
the flagship warping-flow model (mirrors GS_SOR_llin4_2d,
opticalflowSolvers.c:504-680).

Measurement notes
-----------------
* This environment reaches the TPU through the experimental 'axon'
  tunnel, which adds a large fixed cost per dispatched call (input
  streaming); jax.block_until_ready also returns early, so only a
  device->host copy truly syncs. Sweep kernels are therefore measured as
  a MARGINAL rate: time the same solve at two iteration counts and
  divide the difference — that is the sustained on-chip rate a real
  (untunnelled) deployment sees. End-to-end frames/s is reported as
  measured, tunnel overhead included (pessimistic).
* ``vs_baseline``: the reference publishes no numbers (BASELINE.md), so
  the baseline is measured here as a vectorised single-core NumPy port
  of the same sweep arithmetic on this host's CPU — an optimistic
  stand-in for the reference's single-threaded C MEX kernel. The
  BASELINE.json north star asks for >=20x that per chip. Metrics with no
  meaningful NumPy twin report vs_baseline vs the XLA path instead
  (noted in the metric name).
"""

import json
import os
import sys
import time

import numpy as np

H = W = 1024
REPS = 3

# HBM bandwidth per chip (GB/s) by device kind, for speed-of-light
# accounting; conservative public numbers.
_HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1638.0,
    "TPU v6e": 1638.0,
}


def _hbm_gbps(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, vv in _HBM_GBPS.items():
        if kind.startswith(k):
            return vv
    return 819.0


def _oracle_e2e_seconds():
    """Single-core CPU baseline for flow_nd on Yosemite, measured once by
    scripts/bench_oracle_e2e.py. Two flavours are recorded (vectorised
    NumPy red-black: 117.1 s; literal sequential-ALR port on LAPACK
    solve_banded: 34.8 s); the FASTER one is the denominator — the
    conservative stand-in for the reference's single-core C MEX path."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "golden", "oracle_e2e.json")
    try:
        with open(path) as f:
            d = json.load(f)
        vals = [float(d[k]) for k in
                ("solver1_vectorised_numpy_s", "solver2_literal_alr_s")
                if k in d]
        return min(vals) if vals else 0.0
    except Exception:
        return 0.0


def numpy_sweep_throughput(h=256, w=256, iters=4):
    """Vectorised single-core red-black llin4 sweep in NumPy (proxy for the
    reference's single-threaded C kernel; same arithmetic per pixel)."""
    rng = np.random.default_rng(0)
    f32 = np.float32
    u, v, du, dv = (rng.random((h, w), dtype=f32) for _ in range(4))
    m, cu, cv, duc, dvc = (rng.random((h, w), dtype=f32) for _ in range(5))
    ww = wn = we = ws = np.full((h, w), 0.25, dtype=f32)
    ii, jj = np.mgrid[0:h, 0:w]
    interior = (ii > 0) & (ii < h - 1) & (jj > 0) & (jj < w - 1)
    masks = [interior & (((ii + jj) % 2) == p) for p in (0, 1)]
    wsum = ww + wn + we + ws
    inv_u = 1.0 / (wsum + duc)
    inv_v = 1.0 / (wsum + dvc)
    omega = f32(1.9)

    def nbr(x):
        xp = np.pad(x, 1, mode="edge")
        return (ww * xp[1:-1, :-2] + we * xp[1:-1, 2:]
                + wn * xp[:-2, 1:-1] + ws * xp[2:, 1:-1])

    t0 = time.perf_counter()
    for _ in range(iters):
        for mask in masks:
            su = nbr(du + u) - u * wsum
            sv = nbr(dv + v) - v * wsum
            du = np.where(mask, (1 - omega) * du + omega * (su + cu - m * dv) * inv_u, du)
            dv = np.where(mask, (1 - omega) * dv + omega * (sv + cv - m * du) * inv_v, dv)
        for f in (du, dv):
            f[0, :] = f[1, :]
            f[-1, :] = f[-2, :]
            f[:, 0] = f[:, 1]
            f[:, -1] = f[:, -2]
    dt = time.perf_counter() - t0
    return h * w * iters / dt / 1e6


def emit(metric, value, unit, vs):
    print(json.dumps({"metric": metric, "value": round(float(value), 4),
                      "unit": unit, "vs_baseline": round(float(vs), 2)}),
          flush=True)


def _sync(x):
    np.asarray(x)  # device->host copy = true synchronisation on axon


def _family_e2e_lines():
    """Per-family end-to-end lines (VERDICT r4 #2), one subprocess each
    (scripts/bench_family_e2e.py) so the open XLA:TPU fused-disparity
    defect can at worst cost one line. MUST run before this process
    touches the TPU: a subprocess crash restarts the tunnel worker,
    which would sever an existing parent connection."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    fams = ["flow_fmg", "flow_ad", "tv4", "tv8", "gac_a", "gac_b",
            "disparity_sym", "disparity", "segmentation"]
    for fam in fams:
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(here, "scripts",
                                              "bench_family_e2e.py"), fam],
                capture_output=True, text=True, timeout=1500)
            emitted = False
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    emitted = True
            if not emitted:
                tail = (r.stdout + r.stderr).strip().splitlines()[-1:]
                print(f"# family {fam} e2e produced no line "
                      f"(rc={r.returncode}): {' '.join(tail)[:200]}",
                      flush=True)
        except Exception as e:
            print(f"# family {fam} e2e failed: {e!r}", flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    if "--skip-families" not in sys.argv:
        _family_e2e_lines()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def field(scale=1.0, shape=(H, W)):
        return jnp.asarray(rng.random(shape) * scale, dtype=jnp.float32)

    u, v, du, dv = field(0.1), field(0.1), field(0.0), field(0.0)
    m, cu, cv = field(0.01), field(), field()
    duc, dvc = field() + 1.0, field() + 1.0
    ww = wn = we = ws = jnp.full((H, W), 0.25, jnp.float32)

    def timed(fn, *args, chain=2):
        out = fn(*args)
        _sync(jax.tree_util.tree_leaves(out)[0])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            o = None
            for _ in range(chain):
                o = fn(*args)
            _sync(jax.tree_util.tree_leaves(o)[0])
            best = min(best, (time.perf_counter() - t0) / chain)
        return best

    def chained_sweep_time(solver, i1=128, i2=4096):
        """Marginal seconds/sweep between iteration counts i1 and i2,
        with the output chained back in to keep the device busy. The span
        must dwarf the tunnel's per-call jitter (tens of ms), hence
        thousands of sweeps."""
        def run(iters):
            def fn():
                cdu, cdv = du, dv
                for _ in range(2):
                    cdu, cdv = solver(cdu, cdv, iters)
                return cdu
            out = fn(); _sync(out)
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                out = fn()
                _sync(out)
                best = min(best, (time.perf_counter() - t0) / 2)
            return best
        return (run(i2) - run(i1)) / (i2 - i1)

    base = numpy_sweep_throughput()

    def call_inclusive(fn, *args, chain=3):
        """Whole-call seconds (includes the tunnel's fixed per-call cost:
        pessimistic lower bound on the kernel's true rate)."""
        return timed(fn, *args, chain=chain)

    # --- HEADLINE first (cheapest compiles; re-emitted last) -------------
    from pde_tpu.kernels import sweeps as ksweeps
    from pde_tpu.kernels.tiled import tiled_relax, plan_stripes, _halo_for
    prep, sw = ksweeps.flow_llin4_sweep(1.9)
    consts = (u, v, m, cu, cv, duc, dvc, ww, wn, we, ws)

    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = "/tmp/pde_tpu_trace"
        jax.profiler.start_trace(trace_dir)

    dt_db = chained_sweep_time(
        lambda a, b, it: tiled_relax((a, b) + consts, sw, 2, it,
                                     k_max=4, prepare_fn=prep,
                                     double_buffer=True))
    dt_ser = chained_sweep_time(
        lambda a, b, it: tiled_relax((a, b) + consts, sw, 2, it,
                                     k_max=4, prepare_fn=prep))
    emit("llin4 flow SOR sweep, Pallas serial stripe kernel (1024x1024, "
         "sustained; k=4)", H * W / dt_ser / 1e6, "Mpix-iters/s",
         (H * W / dt_ser / 1e6) / base)
    dt = min(dt_db, dt_ser)
    if trace_dir is not None:
        jax.profiler.stop_trace()
        print(f"# profiler trace written to {trace_dir}", flush=True)
    tiled_rate = H * W / dt / 1e6
    variant = "double-buffered DMA" if dt_db < dt_ser else "serial DMA"
    headline = ("llin4 flow SOR sweep, Pallas tiled kernel (1024x1024, "
                f"sustained; temporal blocking k=4, best variant: {variant})")
    emit(headline, tiled_rate, "Mpix-iters/s", tiled_rate / base)

    # bandwidth accounting: the stripe engine moves (13 reads + 2 writes)
    # fields once per k-sweep chunk, plus the 2*halo overlap rows
    try:
        k, stripe, _ = plan_stripes(H, W, 13, 4096, 4,
                                    double_buffer=(dt_db <= dt_ser))
        halo = _halo_for(k)
        bytes_per_pix_iter = 15 * 4 / k * (1 + 2 * halo / stripe)
        gbps = tiled_rate * 1e6 * bytes_per_pix_iter / 1e9
        sol = _hbm_gbps(jax.devices()[0])
        emit(f"headline kernel HBM bandwidth (bytes/pix-iter={bytes_per_pix_iter:.1f})",
             gbps, "GB/s", gbps / sol)  # vs_baseline = fraction of HBM speed-of-light
    except Exception as e:
        print(f"# bandwidth accounting failed: {e!r}", flush=True)

    # --- XLA red-black SOR (the pure-XLA path, for comparison) ----------
    try:
        from pde_tpu.solvers.sor import sor_flow_llin4 as xla_sor
        dt = chained_sweep_time(
            lambda a, b, it: xla_sor(u, v, a, b, m, cu, cv, duc, dvc,
                                     ww, wn, we, ws, it, 1.9))
        xla_rate = H * W / dt / 1e6
        emit("llin4 flow SOR sweep, XLA path (1024x1024, sustained)",
             xla_rate, "Mpix-iters/s", xla_rate / base)
    except Exception as e:  # pragma: no cover
        print(f"# xla sweep failed: {e!r}", flush=True)

    # --- line-implicit and level-set kernels: MARGINAL rates -------------
    # (chained iteration-count differencing, same methodology note as the
    # headline: the axon tunnel's fixed per-call cost would otherwise
    # dominate; a real deployment dispatches on-host.)
    try:
        from pde_tpu.solvers.tdma import alr_flow_llin4
        dt = chained_sweep_time(
            lambda a, b, it: alr_flow_llin4(u, v, a, b, m, cu, cv, duc, dvc,
                                            ww, wn, we, ws, it, 1.9),
            i1=16, i2=256)
        emit("llin4 flow zebra-ALR (batched TDMA, cyclic-reduction lines) sweep (1024x1024, sustained)",
             H * W / dt / 1e6, "Mpix-iters/s", (H * W / dt / 1e6) / base)
    except Exception as e:
        print(f"# alr sweep failed: {e!r}", flush=True)

    try:
        from pde_tpu.solvers.krylov import pcg_flow_llin4
        dt = chained_sweep_time(
            lambda a, b, it: pcg_flow_llin4(u, v, a, b, m, cu, cv, duc, dvc,
                                            ww, wn, we, ws, it, 1.9),
            i1=16, i2=128)
        emit("llin4 flow PCG (zebra-ADI preconditioned) iteration (1024x1024, sustained)",
             H * W / dt / 1e6, "Mpix-iters/s", (H * W / dt / 1e6) / base)
    except Exception as e:
        print(f"# pcg failed: {e!r}", flush=True)

    try:
        from pde_tpu.solvers.aos import cv_aos_step
        import functools
        phi = field(2.0) - 1.0
        data = field(0.5)
        dh = 1.0 / (np.pi * (1.0 + phi**2))
        gphi = field(0.5) + 0.5

        @functools.partial(jax.jit, static_argnames=("iters",))
        def aos(p, q, iters):
            def body(_, pq):
                p_, q_ = pq
                return cv_aos_step(p_, data, dh, gphi, 0.25, 1000.0), p_
            return jax.lax.fori_loop(0, iters, body, (p, q))

        dt = chained_sweep_time(
            lambda a, b, it: aos(a, b, it), i1=32, i2=512)
        emit("Chan-Vese AOS step (1024x1024, sustained)",
             H * W / dt / 1e6, "Mpix-steps/s", (H * W / dt / 1e6) / base)
    except Exception as e:
        print(f"# aos failed: {e!r}", flush=True)

    try:
        from pde_tpu.solvers.reinit import reinit
        phi = field(2.0) - 1.0

        def chain_reinit(a, b, it):
            return reinit(a, steps=it), a

        # a reinit step is ONE fused elementwise pass (~10 us at 1024^2):
        # spans must reach hundreds of ms to beat tunnel jitter
        dt = chained_sweep_time(chain_reinit, i1=2000, i2=20000)
        emit("signed-distance reinit Euler step (1024x1024, sustained)",
             H * W / dt / 1e6, "Mpix-steps/s", (H * W / dt / 1e6) / base)
    except Exception as e:
        print(f"# reinit failed: {e!r}", flush=True)

    # --- end-to-end flagship model --------------------------------------
    # One fused program per frame (flow_nd_fused); baseline = measured
    # single-core vectorised-NumPy oracle wall-clock on the same pair
    # (scripts/bench_oracle_e2e.py -> tests/golden/oracle_e2e.json).
    try:
        from pde_tpu.utils.io import load_yosemite
        from pde_tpu.models.flow_nd import flow_nd_fused
        y0, y1, _, _ = load_yosemite()
        y0 = jnp.asarray(y0)
        y1 = jnp.asarray(y1)

        def e2e():
            uo, vo = flow_nd_fused(y0, y1, "grad", "gradmag")
            _sync(uo)
        e2e()  # compile the whole-frame program
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            e2e()
            best = min(best, time.perf_counter() - t0)
        base_e2e = _oracle_e2e_seconds()
        vsb = (base_e2e / best) if base_e2e > 0 else 0.0
        emit(f"flow_nd end-to-end, Yosemite {tuple(y0.shape)} (fused single-dispatch, incl. tunnel overhead)",
             1.0 / best, "frames/s", vsb)

        # tunnel-free marginal rate: a video clip is ONE dispatch
        # (lax.scan over consecutive pairs); difference T=5 vs T=2
        # isolates the pure on-device per-frame cost
        from pde_tpu.models.flow_nd import flow_nd_sequence

        def clip(t):
            frames = jnp.stack([y0 if i % 2 == 0 else y1 for i in range(t)])
            def run():
                us, vs = flow_nd_sequence(frames, "grad", "gradmag")
                _sync(us)
            run()  # compile
            bb = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                run()
                bb = min(bb, time.perf_counter() - t0)
            return bb

        marg = (clip(5) - clip(2)) / 3.0
        emit(f"flow_nd end-to-end, Yosemite {tuple(y0.shape)} (on-device marginal, video-clip scan)",
             1.0 / marg, "frames/s", (base_e2e / marg) if base_e2e > 0 else 0.0)

        # gather-free windowed warp (ops/warp.warp_window, radius 8 —
        # exact on Yosemite whose |flow| < 5): same pipeline, the
        # serialized 2D gathers replaced by shift-add selects
        from pde_tpu.models.flow_nd import FlowNDParams

        pw = FlowNDParams(warp_window=8)

        def e2e_w():
            uo, vo = flow_nd_fused(y0, y1, "grad", "gradmag", pw)
            _sync(uo)
        e2e_w()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            e2e_w()
            best = min(best, time.perf_counter() - t0)
        emit(f"flow_nd end-to-end, Yosemite {tuple(y0.shape)} (windowed shift-add warp r=8, fused, incl. tunnel)",
             1.0 / best, "frames/s", (base_e2e / best) if base_e2e > 0 else 0.0)

        def clip_w(t):
            frames = jnp.stack([y0 if i % 2 == 0 else y1 for i in range(t)])
            def run():
                us, vs = flow_nd_sequence(frames, "grad", "gradmag", pw)
                _sync(us)
            run()
            bb = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                run()
                bb = min(bb, time.perf_counter() - t0)
            return bb

        marg_w = (clip_w(5) - clip_w(2)) / 3.0
        emit(f"flow_nd end-to-end, Yosemite {tuple(y0.shape)} (windowed warp r=8, on-device marginal)",
             1.0 / marg_w, "frames/s", (base_e2e / marg_w) if base_e2e > 0 else 0.0)
    except Exception as e:
        print(f"# e2e failed: {e!r}", flush=True)

    # --- virtual-mesh halo overhead (subprocess: needs the CPU backend) --
    try:
        import subprocess
        out = subprocess.run(
            [os.sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts", "bench_scaling.py")],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
    except Exception as e:
        print(f"# scaling bench failed: {e!r}", flush=True)

    # re-emit the headline as the LAST line (the driver parses the final
    # JSON line of the output)
    emit(headline, tiled_rate, "Mpix-iters/s", tiled_rate / base)


if __name__ == "__main__":
    main()
