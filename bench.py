#!/usr/bin/env python
"""Driver benchmark: one 41f x 480x720 4D-reconstruction window on one TPU chip.

Measures the reference's headline configuration (BASELINE.json config #1 /
BASELINE.md): 4 DPM denoise steps of the CogVideoX-5B-class DiT (42 x 3072 x 48
heads, 96->56 ch) + chunked causal-VAE encode/decode, end to end, bf16,
random-init weights (the public AetherV1 checkpoint is unreachable offline — the
compute graph and shapes are identical, so wall-clock is representative).

Prints ONE JSON line:
  {"metric": "e2e_seconds_per_41f_480p_window", "value": ..., "unit": "s",
   "vs_baseline": <north-star 10 s / value>, ...sub-metrics...}
"""

import json
import os
import sys
import time

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA compilation cache: the 42-layer pipeline takes minutes to
# compile cold; warm runs (same shapes) skip straight to execution
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _block(tree):
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), tree)


def main() -> None:
    mode = os.environ.get("AETHER_BENCH_MODE", "all")
    from aether_tpu.config import PipelineConfig
    from aether_tpu.models import init_dit_params, init_vae_params
    from aether_tpu.pipeline import AetherPipeline
    from aether_tpu.pipeline.aether import (
        _decode_pixels,
        _decode_pixels_tiled,
        _denoise,
        _encode_pixels,
        _encode_pixels_tiled,
    )

    # record the persistent-cache population BEFORE this run compiles into it
    # (distinguishes warm-cache starts from cold in the reported JSON)
    try:
        _cache_entries = len(os.listdir(_CACHE_DIR))
    except OSError:
        _cache_entries = 0

    backend = jax.default_backend()
    on_accel = backend not in ("cpu",)
    dtype = jnp.bfloat16 if on_accel else jnp.float32

    height, width, num_frames, steps = 480, 720, 41, 4
    if not on_accel:
        # CPU smoke fallback so the bench stays runnable anywhere: tiny config
        cfg = PipelineConfig.tiny()
        height, width, num_frames = 64, 96, 17
    else:
        cfg = PipelineConfig.aetherv1()

    def mark(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    if on_accel:
        from aether_tpu.utils.profiling import warm_transfer_channel

        mark("warming D2H channel (must precede big allocations)")
        mark(f"channel warm in {warm_transfer_channel():.1f}s")

    key = jax.random.PRNGKey(0)
    # Weight quantization on the accelerator halves resident DiT bytes
    # (10.4 GB -> 5.3 GB) and never materializes the bf16 tree, which this
    # chip's memory budget (16 GB minus the D2H staging reservation) needs.
    # int8 + dynamic activation quantization is the default: the full-config
    # quality gate (scripts/quant_quality_gate.py, BASELINE.md round 2)
    # measured int8 weights at 9x LOWER output error than fp8 (cosine
    # 0.99993 vs 0.99922 vs bf16) with w8a8 adding almost nothing (0.99992),
    # while the int8 MXU runs 2x the bf16 peak (denoise 2.45 vs 2.67 s/step).
    weights_format = "bf16" if not on_accel else os.environ.get(
        "AETHER_WEIGHT_QUANT", "int8"
    )
    act_quant = (os.environ.get("AETHER_ACT_QUANT", "1") == "1" and on_accel
                 and weights_format == "int8")
    mark(f"init dit params ({weights_format}, act_quant={act_quant})")
    if weights_format in ("fp8", "int8"):
        from aether_tpu.models.dit import init_quantized_dit_params

        dit_params = init_quantized_dit_params(
            key, cfg.dit,
            dtype=jnp.int8 if weights_format == "int8" else None)
    else:
        dit_params = init_dit_params(key, cfg.dit, dtype=dtype)
    mark("init vae params")
    vae_params = init_vae_params(jax.random.fold_in(key, 1), cfg.vae, dtype=dtype)
    _block(dit_params)
    mark("params ready")
    text = np.zeros((1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim),
                    np.float32)
    # Headline numbers are measured at the PIPELINE DEFAULT wire quality
    # (quantization-exact: u8 rgb / fp16 disparity / u8 input). The lossy
    # yuv420 + u8-disparity wires — matching the mp4 artifact's native pixel
    # format, ~40 MB vs ~75 MB per window on a transfer-bound link — are an
    # explicit opt-in (AETHER_LOSSY_WIRES=1), mirroring the pipeline API where
    # they are opt-in too; a best-effort lossy-wire e2e timing is reported
    # alongside either way (advisor round 1: recorded numbers must be
    # comparable to default pipeline behavior).
    lossy_wires = os.environ.get("AETHER_LOSSY_WIRES", "0") == "1" and on_accel
    wire_kwargs = dict(
        wire_input="yuv420" if lossy_wires else "u8",
        wire_rgb="yuv420" if lossy_wires else None,
        wire_disparity="u8" if lossy_wires else "fp16",
    )
    pipe = AetherPipeline(cfg, dit_params, vae_params, text, compute_dtype=dtype,
                          act_quant=act_quant, **wire_kwargs)

    rng = np.random.default_rng(42)
    video = (rng.uniform(0, 1, size=(num_frames, height, width, 3)) * 255).astype(
        np.uint8
    )
    run_kwargs = dict(
        task="reconstruction", video=video, height=height, width=width,
        num_frames=num_frames, num_inference_steps=steps, fps=12, seed=42,
    )

    def run_with_retry(attempts: int = 4):
        # the tunneled chip sporadically throws RESOURCE_EXHAUSTED under
        # remote-side contention; retry rather than zeroing the whole bench
        for i in range(attempts):
            try:
                return pipe(**run_kwargs)
            except Exception as exc:
                print(f"attempt {i + 1} failed: {type(exc).__name__}",
                      file=sys.stderr, flush=True)
                if i == attempts - 1:
                    raise
                time.sleep(30.0)

    # ---- warmup / compile ----
    compile_and_first_run_s = 0.0
    e2e_times, e2e_s = [], float("nan")
    if mode in ("all", "full"):
        mark("warmup run")
        t0 = time.perf_counter()
        run_with_retry()
        compile_and_first_run_s = time.perf_counter() - t0

        # ---- e2e timed runs ----
        mark("timed e2e runs")
        for _ in range(3):
            t0 = time.perf_counter()
            run_with_retry()
            e2e_times.append(round(time.perf_counter() - t0, 3))
        e2e_s = float(np.median(e2e_times))

    # ---- alternate-wire e2e (best-effort): whichever wire set the headline
    # did NOT use, so both exact-wire and lossy-wire timings are on record ----
    alt_wire_s = None
    if on_accel and mode in ("all", "full"):
        try:
            alt = AetherPipeline(
                cfg, dit_params, vae_params, text, compute_dtype=dtype,
                act_quant=act_quant,
                wire_input="u8" if lossy_wires else "yuv420",
                wire_rgb=None if lossy_wires else "yuv420",
                wire_disparity="fp16" if lossy_wires else "u8",
            )
            alt(**run_kwargs)  # warm the (tiny) wire-pack graphs
            t0 = time.perf_counter()
            alt(**run_kwargs)
            alt_wire_s = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            print(f"alt-wire run failed: {type(exc).__name__}",
                  file=sys.stderr)

    # ---- sub-metrics on the staged internals (best-effort: a contended
    # remote chip must not zero out the headline metric) ----
    vae_encode_s = denoise_s = vae_decode_s = float("nan")
    if mode in ("all", "full"):
        try:
            _sub_metrics_body(cfg, dtype, on_accel, pipe, dit_params,
                              vae_params, video, height, width, num_frames,
                              steps)
        except Exception as exc:
            import traceback

            print(f"sub-metrics failed: {type(exc).__name__}",
                  file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
        else:
            vae_encode_s, denoise_s, vae_decode_s = _SUB[:]

    # (prediction runs in its OWN child process on accelerators: a 50-step
    # CFG-pair run once wedged the tunneled chip and nulled every later
    # metric; process isolation gives it a fresh device client)
    pred_steps = int(os.environ.get("AETHER_BENCH_PRED_STEPS", "50"))
    pred_e2e_s = None
    if mode in ("all", "pred"):
        from aether_tpu.apps.actions import action_raymap

        raymap = action_raymap("forward", num_frames=num_frames,
                               height=height, width=width)

        def _pred_once(steps_n):
            kwargs = dict(
                task="prediction", image=video[0], raymap=raymap,
                height=height, width=width, num_frames=num_frames,
                num_inference_steps=steps_n, fps=12, seed=42,
            )
            mark(f"prediction warmup ({steps_n} steps, CFG pair)")
            pipe(**kwargs)
            mark("prediction timed run")
            t0 = time.perf_counter()
            pipe(**kwargs)
            return round(time.perf_counter() - t0, 3)

        try:
            pred_e2e_s = _pred_once(pred_steps)
        except Exception:
            import traceback

            traceback.print_exc(file=sys.stderr)
            # a wedged in-process client won't recover, but a transient
            # compile/transfer failure might; bank at least the 4-step number
            if pred_steps != 4:
                try:
                    pred_e2e_s = _pred_once(4)
                    pred_steps = 4
                except Exception:
                    traceback.print_exc(file=sys.stderr)
        # alternate metric (best-effort): the opt-in CFG prefix skip
        # (AETHER_CFG_SKIP_TOL — single-stream denoise while the dynamic-CFG
        # scale sits at ~1.0). Measured round 5: at the REAL 50-step ramp the
        # reference's quirky t.item()-based cosine OSCILLATES pseudo-randomly
        # in [1, 1+g] (frac spans [-19, 1] before the ^5), so the skippable
        # prefix is EMPTY — the variant is only timed when the schedule
        # actually yields a skippable prefix, else it would re-run the
        # identical graph (confirmed bit-identical outputs on-chip).
        pred_skip_e2e_s = None
        skip_tol = os.environ.get("AETHER_BENCH_CFG_SKIP", "1e-3")
        n_skip = 0
        if skip_tol not in ("", "0"):
            from aether_tpu.pipeline.aether import (
                dynamic_cfg_schedule, make_sampling_plan as _msp)

            _plan = _msp(cfg.scheduler, pred_steps)
            _g = dynamic_cfg_schedule(np.asarray(_plan.timesteps), pred_steps,
                                      3.0)
            _near = np.abs(_g - 1.0) <= float(skip_tol)
            n_skip = int(np.argmin(_near)) if not _near.all() else pred_steps
        if pred_e2e_s is not None and on_accel and n_skip > 0:
            try:
                os.environ["AETHER_CFG_SKIP_TOL"] = skip_tol
                pred_skip_e2e_s = _pred_once(pred_steps)
            except Exception:
                import traceback

                traceback.print_exc(file=sys.stderr)
            finally:
                os.environ.pop("AETHER_CFG_SKIP_TOL", None)
    if mode == "pred":
        print(json.dumps({"_pred": {"pred_e2e_s": pred_e2e_s,
                                    "pred_steps": pred_steps,
                                    "pred_skip_e2e_s": pred_skip_e2e_s,
                                    "pred_skip_tol": skip_tol}}))
        return

    # device_compute_s: warm on-chip work for one window (vae encode + 4-step
    # denoise + stacked rgb+disparity decode), measured in-run with
    # block_until_ready fences. This is the tunnel-independent headline —
    # e2e swings ±50% with D2H link weather (0.7-16 MB/s observed), while
    # device compute is stable run to run (BASELINE.md), so rounds compare
    # on this number.
    have_sub = all(x == x for x in (vae_encode_s, denoise_s, vae_decode_s))
    device_compute_s = (
        round(vae_encode_s + denoise_s + vae_decode_s, 3) if have_sub else None
    )

    # MFU: analytic model FLOPs (matmuls/convs only, dtype-independent) over
    # the chip's bf16 peak — "is this fast?" stated directly (VERDICT r3 #2).
    from aether_tpu.utils.flops import bf16_peak_tflops, window_model_tflops

    denoise_tf, decode_tf = window_model_tflops(
        cfg, height, width, num_frames, steps)
    peak = bf16_peak_tflops(jax.devices()[0].device_kind) if on_accel else None
    denoise_tfps = (round(denoise_tf / denoise_s, 1)
                    if denoise_s == denoise_s else None)
    decode_tfps = (round(decode_tf / vae_decode_s, 1)
                   if vae_decode_s == vae_decode_s else None)
    mfu = (round(denoise_tf / denoise_s / peak, 3)
           if peak and denoise_s == denoise_s else None)
    result = {
        "metric": "e2e_seconds_per_41f_480p_window",
        "value": round(e2e_s, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / e2e_s, 3),  # north-star: <10 s (BASELINE.md)
        "device_compute_s": device_compute_s,
        "denoise_steps_per_sec_per_chip": round(steps / denoise_s, 3)
        if denoise_s == denoise_s else None,
        "denoise_s": round(denoise_s, 3) if denoise_s == denoise_s else None,
        "vae_encode_s": round(vae_encode_s, 3)
        if vae_encode_s == vae_encode_s else None,
        "vae_decode_s": round(vae_decode_s, 3)
        if vae_decode_s == vae_decode_s else None,
        "vae_decode_fps": round(num_frames / vae_decode_s, 2)
        if vae_decode_s == vae_decode_s else None,
        "model_tflops_denoise": round(denoise_tf, 1),
        "model_tflops_decode": round(decode_tf, 1),
        "denoise_tflops_per_s": denoise_tfps,
        "vae_decode_tflops_per_s": decode_tfps,
        "mfu": mfu,  # denoise model-TFLOP rate / chip bf16 peak
        "compile_plus_first_run_s": round(compile_and_first_run_s, 1),
        # first-run overhead beyond a steady-state e2e run = compile/cache
        # deserialization cost; small when .jax_cache is warm (VERDICT r3 #7)
        "compile_overhead_s": round(compile_and_first_run_s - e2e_s, 1)
        if e2e_s == e2e_s else None,
        "compile_cache_entries": _cache_entries,
        "e2e_runs_s": e2e_times,  # D2H throughput on this link swings 20x
        "pred_e2e_s": pred_e2e_s,
        "pred_steps": pred_steps if pred_e2e_s is not None else None,
        "pred_steps_per_sec": round(pred_steps / pred_e2e_s, 3)
        if pred_e2e_s else None,
        "alt_wire_e2e_s": alt_wire_s,
        "backend": backend,
        "weights": weights_format + ("+a8" if act_quant else ""),
        "wire": (f"in:{pipe.wire_input} rgb:{pipe.wire_rgb or 'u8-auto'} "
                 f"disp:{pipe.wire_disparity}"
                 + (" [lossy]" if lossy_wires else " [exact-default]")),
        "config": f"{num_frames}f x {height}x{width}, {steps} steps, "
                  f"{cfg.dit.num_layers}L x {cfg.dit.hidden_size}d",
    }
    print(json.dumps(result))


_SUB = [float("nan")] * 3


def _sub_metrics_body(cfg, dtype, on_accel, pipe, dit_params, vae_params,
                      video, height, width, num_frames, steps) -> None:
    from aether_tpu.models.dit import use_fixed_max_default
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings
    from aether_tpu.pipeline.aether import (
        _decode_pixels,
        _decode_pixels_tiled,
        _denoise,
        _encode_pixels,
        _encode_pixels_tiled,
        make_sampling_plan,
    )
    from aether_tpu.utils.preprocess import preprocess_video

    # sub-metrics must measure the SHIPPING configuration: the pipeline
    # resolves fixed-max attention from the env, so the standalone denoise
    # timing has to as well
    _fm = use_fixed_max_default()

    f_lat = (num_frames - 1) // cfg.vae_scale_factor_temporal + 1
    pixels = jnp.asarray(preprocess_video(video, height, width))
    plan = make_sampling_plan(cfg.scheduler, steps)
    guidance = jnp.ones((steps,), jnp.float32)
    cos, sin = prepare_rotary_positional_embeddings(
        cfg.dit, height, width, f_lat,
        vae_scale_factor_spatial=cfg.vae_scale_factor_spatial, fps=12,
    )
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    k = jax.random.PRNGKey(7)

    _encode = _encode_pixels_tiled if on_accel else _encode_pixels
    cond = _encode(cfg, dtype, vae_params, pixels, k)
    _block(cond)
    t0 = time.perf_counter()
    cond = _encode(cfg, dtype, vae_params, pixels, k)
    _block(cond)
    vae_encode_s = time.perf_counter() - t0

    h_lat = height // cfg.vae_scale_factor_spatial
    w_lat = width // cfg.vae_scale_factor_spatial
    camera = jnp.zeros((1, f_lat, 24, h_lat, w_lat), dtype)
    cond_full = jnp.concatenate([cond, camera], axis=2)

    latents = _denoise(cfg, pipe.attn_impl, dtype, "reconstruction", False,
                       dit_params, pipe.empty_prompt_embeds, cond_full, plan,
                       guidance, cos, sin, k, act_quant=pipe.act_quant, fixed_max=_fm)
    _block(latents)
    t0 = time.perf_counter()
    latents = _denoise(cfg, pipe.attn_impl, dtype, "reconstruction", False,
                       dit_params, pipe.empty_prompt_embeds, cond_full, plan,
                       guidance, cos, sin, k, act_quant=pipe.act_quant, fixed_max=_fm)
    _block(latents)
    denoise_s = time.perf_counter() - t0

    lat_c = cfg.vae.latent_channels
    _decode = _decode_pixels_tiled if on_accel else _decode_pixels
    # measure the SHIPPING decode: rgb + disparity ride one stacked batch-2
    # pass (pipeline._decode_rgb_and_disparity) when its 2x chunk workspace
    # fits next to the resident int8 DiT — otherwise the pipeline falls back
    # to the two serial passes, so time THAT instead (full per-window decode
    # cost either way)
    rgb_lat = latents[:, :, :lat_c]
    disp_lat = latents[:, :, lat_c : 2 * lat_c]
    try:
        both = jnp.concatenate([rgb_lat, disp_lat], axis=0)
        frames_out = _decode(cfg, dtype, vae_params, both)
        _block(frames_out)
        t0 = time.perf_counter()
        frames_out = _decode(cfg, dtype, vae_params, both)
        _block(frames_out)
        vae_decode_s = time.perf_counter() - t0
    except jax.errors.JaxRuntimeError as exc:
        from aether_tpu.pipeline.aether import _is_oom_error

        if not _is_oom_error(exc):
            raise
        print("decode sub-metric: stacked batch-2 pass does not fit; "
              "timing the serial fallback", file=sys.stderr, flush=True)
        for lat in (rgb_lat, disp_lat):
            _block(_decode(cfg, dtype, vae_params, lat))
        t0 = time.perf_counter()
        for lat in (rgb_lat, disp_lat):
            _block(_decode(cfg, dtype, vae_params, lat))
        vae_decode_s = time.perf_counter() - t0

    _SUB[0], _SUB[1], _SUB[2] = vae_encode_s, denoise_s, vae_decode_s


def _cpu_env(env: dict) -> dict:
    """Child env that cannot touch the TPU tunnel.

    JAX_PLATFORMS=cpu alone is NOT enough: the axon sitecustomize (on
    PYTHONPATH) monkeypatches ``_get_backend_uncached`` so even
    ``jax.default_backend()`` initializes the axon PJRT client, which blocks
    indefinitely when the tunnel is degraded (observed 2026-08-17). Stripping
    the sitecustomize dir from PYTHONPATH removes the axon plugin entirely.
    """
    env = dict(env)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    )
    return env


def _run_child(mode: str, attempts: int, tag: str,
               timeout_s: Optional[float] = None,
               deadline_s: Optional[float] = None,
               force_cpu: bool = False):
    """Run one measurement child (AETHER_BENCH_MODE=mode); returns the parsed
    JSON dict or None. Retries with a fresh device client — a wedged tunnel
    client never recovers in-process (observed: once a RESOURCE_EXHAUSTED
    fires, every subsequent op fails). ``timeout_s`` bounds one attempt (a
    degraded tunnel hangs device init indefinitely; channel warm alone has
    taken 38 min); ``deadline_s`` stops retrying once the total elapsed time
    exceeds it so a dead tunnel can't eat the whole driver budget."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["AETHER_BENCH_CHILD"] = "1"
    env["AETHER_BENCH_MODE"] = mode
    if force_cpu:
        env = _cpu_env(env)
    t_start = time.monotonic()
    for attempt in range(attempts):
        if deadline_s is not None and attempt > 0 and \
                time.monotonic() - t_start > deadline_s:
            print(f"bench[{tag}] deadline {deadline_s}s exceeded after "
                  f"{attempt} attempts", file=sys.stderr, flush=True)
            break
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired as exc:
            print(f"bench[{tag}] attempt {attempt + 1} timed out after "
                  f"{timeout_s}s", file=sys.stderr, flush=True)
            try:
                with open(os.path.join(here, f"bench_stderr_{tag}.log"),
                          "w") as f:
                    f.write((exc.stderr or b"").decode("utf-8", "replace")
                            if isinstance(exc.stderr, bytes)
                            else (exc.stderr or ""))
            except OSError:
                pass
            time.sleep(90.0)
            continue
        try:
            with open(os.path.join(here, f"bench_stderr_{tag}.log"), "w") as f:
                f.write(proc.stderr)
        except OSError:
            pass
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        sys.stderr.write(proc.stderr[-2000:] + "\n")
        print(f"bench[{tag}] attempt {attempt + 1} failed "
              f"(rc={proc.returncode}); relaunching with a fresh device "
              "client", file=sys.stderr, flush=True)
        time.sleep(60.0)
    return None


def _main_with_process_retry() -> int:
    """Orchestrate the measurement children and print ONE merged JSON line.

    The reconstruction suite ("full") and the CFG-pair prediction ("pred")
    run in SEPARATE child processes on every platform: the prediction once
    wedged the tunneled chip, and process isolation keeps a wedge there from
    nulling the headline metrics (each child also gets a fresh device
    client). Backend detection happens in the child (the parent must never
    initialize a device client of its own).
    """
    if os.environ.get("AETHER_BENCH_CHILD") == "1":
        return main() or 0

    attempts = int(os.environ.get("AETHER_BENCH_ATTEMPTS", "5"))
    full_timeout = float(os.environ.get("AETHER_BENCH_FULL_TIMEOUT", "5400"))
    deadline = float(os.environ.get("AETHER_BENCH_DEADLINE", "10800"))
    result = _run_child("full", attempts, "full", timeout_s=full_timeout,
                        deadline_s=deadline)
    degraded_tunnel = result is None
    if degraded_tunnel:
        # dead/degraded tunnel: record a CPU tiny-config line rather than
        # nothing at all — the driver keys off the JSON line existing
        print("bench[full] accelerator unreachable; falling back to a CPU "
              "tiny-config measurement", file=sys.stderr, flush=True)
        result = _run_child("full", 1, "full_cpu", timeout_s=1800.0,
                            force_cpu=True)
    if result is None:
        return 1
    if degraded_tunnel:
        result["degraded"] = "tunnel unreachable; CPU fallback numbers"
        # a tiny-config CPU time divided into the 10 s TPU north star is not
        # a comparable ratio — don't let a dead tunnel read as a perf win
        result["vs_baseline"] = None
    if result.get("backend") != "cpu":
        time.sleep(90.0)  # back-to-back tunnel clients hang in device init
    pred = _run_child("pred", 1, "pred", timeout_s=3600.0,
                      force_cpu=degraded_tunnel)
    if pred and pred.get("_pred") and pred["_pred"].get("pred_e2e_s"):
        result["pred_e2e_s"] = pred["_pred"]["pred_e2e_s"]
        result["pred_steps"] = pred["_pred"]["pred_steps"]
        result["pred_steps_per_sec"] = round(
            result["pred_steps"] / result["pred_e2e_s"], 3)
        if pred["_pred"].get("pred_skip_e2e_s"):
            result["pred_skip_e2e_s"] = pred["_pred"]["pred_skip_e2e_s"]
            result["pred_skip_tol"] = pred["_pred"].get("pred_skip_tol")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(_main_with_process_retry())
