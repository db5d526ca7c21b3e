#!/usr/bin/env python
"""Generate the END-TO-END cross-framework pipeline golden fixture.

Runs one independent TORCH sampler — condition VAE-encode, latent packing,
per-task CFG uncond masking, the SDE-DPM-Solver++(2M) loop with second-order
state and the reference's dynamic-CFG ``t.item()`` ramp, RGB+disparity decode,
disparity square, raymap unfold — for all three tasks at the tiny config, and
commits final rgb / disparity / raymap to
``tests/fixtures/pipeline_e2e_goldens.npz``.

Per-module parity (DiT blocks, VAE stages, scheduler goldens) cannot see a
WIRING slip between individually-correct modules: latent packing order
(reference ``aetherv1_pipeline_cogvideox.py:666-670``), CFG masking
(``:839-855``), DPM second-order chaining (``:901-915``), disparity square
(``:936-939``), raymap unfold (``:942-949``). This fixture pins the full
sampler path; ``tests/test_pipeline_torch_parity.py`` compares the JAX
pipeline against it within f32 tolerance.

Torch model structure comes from the independently-written anchors
(``tests/test_torch_parity.py::TorchDiTRef``,
``tests/test_vae_torch_parity.py::TorchCogVAE``, audited in
docs/PARITY_AUDIT.md); the sampler logic below is written from the reference
pipeline's documented semantics, with einops for the raymap fold exactly as
the reference does it. The stochastic draws are NOT re-verified — they are
injected from the same threaded-JAX-PRNG streams the JAX pipeline draws
(``pipeline/aether.py:1150-1152`` key discipline), so any change to the
pipeline's key threading breaks this test loudly (regenerate with this
script after auditing the change).

Usage: python scripts/make_pipeline_goldens.py
"""

import math
import pathlib
import sys

import numpy as np
import torch
from einops import rearrange

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aether_tpu.config import PipelineConfig  # noqa: E402
from test_torch_parity import (  # noqa: E402
    TorchDiTRef,
    fill_state_dict_deterministic,
)
from test_vae_torch_parity import TorchCogVAE  # noqa: E402

OUT = _ROOT / "tests" / "fixtures" / "pipeline_e2e_goldens.npz"

DIT_SEED = 20240817  # shared with tests/test_pipeline_torch_parity.py
VAE_SEED = 913


# ---------------------------------------------------------------------------
# Independent numpy SDE-DPM-Solver++(2M) over the CogVideoX schedule.
# Written from the published algorithm (DPM-Solver++ eqs. for the SDE 2M
# variant) + the CogVideoX schedule facts (scaled-linear betas, SD3 SNR shift,
# zero-terminal-SNR rescale, v-prediction, trailing spacing) the reference
# relies on via diffusers' CogVideoXDPMScheduler (consumed at reference
# ``pipeline:780-783,901-915``).
# ---------------------------------------------------------------------------
class NumpyCogDPM:
    def __init__(self, num_steps: int, n_train: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012,
                 snr_shift: float = 3.0):
        betas = np.linspace(beta_start**0.5, beta_end**0.5, n_train,
                            dtype=np.float64) ** 2
        ac = np.cumprod(1.0 - betas)
        ac = ac / (snr_shift + (1.0 - snr_shift) * ac)  # SD3 SNR shift
        # zero-terminal-SNR rescale (Lin et al. 2023): sqrt(ac) affinely
        # mapped so the last timestep has exactly zero SNR
        s = np.sqrt(ac)
        s = (s - s[-1]) * (s[0] / (s[0] - s[-1]))
        self.ac = s**2
        self.n_train = n_train
        self.num_steps = num_steps
        step = n_train / num_steps  # "trailing" spacing
        self.timesteps = np.round(np.arange(n_train, 0, -step)).astype(np.int64) - 1
        self.step_gap = n_train // num_steps

    def _lambda(self, alpha):
        if alpha >= 1.0:
            return np.inf
        return float(np.log(np.sqrt(alpha / (1.0 - alpha))))

    def x0_from_v(self, i, sample, v):
        t = int(self.timesteps[i])
        a = float(self.ac[t])
        return np.sqrt(a) * sample - np.sqrt(1.0 - a) * v

    def step(self, i, sample, v_pred, old_x0, noise):
        """One SDE 2M update; returns (x_prev, x0). ``old_x0`` is the previous
        step's x0 (None at i=0)."""
        t = int(self.timesteps[i])
        prev_t = t - self.step_gap
        a_t = float(self.ac[t])
        a_prev = float(self.ac[prev_t]) if prev_t >= 0 else 1.0  # alpha->1 at the end
        x0 = self.x0_from_v(i, sample, v_pred)

        lam_t, lam_prev = self._lambda(a_t), self._lambda(a_prev)
        h = lam_prev - lam_t
        denoised = x0
        if i > 0 and prev_t >= 0:
            t_back = int(self.timesteps[i - 1])
            h_last = lam_t - self._lambda(float(self.ac[t_back]))
            r = h_last / h
            denoised = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * old_x0
        sigma_t, sigma_prev = np.sqrt(1.0 - a_t), np.sqrt(1.0 - a_prev)
        with np.errstate(over="ignore"):
            c_x = sigma_prev / sigma_t * np.exp(-h) if sigma_t > 0 else 0.0
            c_d = np.sqrt(a_prev) * (1.0 - np.exp(-2.0 * h))
            c_n = sigma_prev * np.sqrt(1.0 - np.exp(-2.0 * h))
        if not np.isfinite(c_x):
            c_x = 0.0  # h = inf (terminal / first zero-SNR step)
        prev = c_x * sample + c_d * denoised + c_n * noise
        return prev, x0


def dynamic_cfg(t_value: int, num_steps: int, g: float) -> float:
    """Reference ``pipeline:879-893``: the ramp is evaluated on the 0..999
    TIMESTEP VALUE (``t.item()``), not the step index."""
    frac = (num_steps - float(t_value)) / num_steps
    return 1.0 + g * (1.0 - math.cos(math.pi * frac**5.0)) / 2.0


def torch_sample(pcfg: PipelineConfig, dit, vae, *, task, num_frames, height,
                 width, steps, guidance_scale, use_dynamic_cfg, seed, fps=12,
                 video_u8=None, image_u8=None, goal_u8=None, raymap=None):
    from aether_tpu.models.rope import prepare_rotary_positional_embeddings

    lat_c = pcfg.vae.latent_channels
    scaling = pcfg.vae.scaling_factor
    f_lat = (num_frames - 1) // pcfg.vae_scale_factor_temporal + 1
    h_lat = height // pcfg.vae_scale_factor_spatial
    w_lat = width // pcfg.vae_scale_factor_spatial
    do_cfg = guidance_scale > 1.0

    # --- PRNG streams injected from the JAX pipeline's key discipline ---
    key = jax.random.PRNGKey(seed)
    key_vae, key_goal, key_denoise = jax.random.split(key, 3)
    key_noise, key_sde = jax.random.split(key_denoise)

    def jr(k, shape):
        return np.asarray(jax.random.normal(k, shape, jnp.float32))

    def to_unit(u8):  # (F, H, W, 3) uint8 -> torch (1, C, T, H, W) in [-1, 1]
        x = torch.from_numpy(u8.astype(np.float32) / 127.5 - 1.0)
        return x[None].permute(0, 4, 1, 2, 3)

    @torch.no_grad()
    def encode(u8, k):
        # framewise mode (8-frame chunks, per-chunk norm stats) — the
        # checkpoint's canonical numerics, see TorchCogVAE.encode_chunked
        moments = vae.encode_chunked(to_unit(u8), 8)  # (1, 2*lat, T', h, w)
        mean, logvar = moments.chunk(2, dim=1)
        mean = mean.permute(0, 2, 3, 4, 1).double()  # channels-last like JAX
        logvar = logvar.permute(0, 2, 3, 4, 1).double().clamp(-30.0, 20.0)
        noise = torch.from_numpy(jr(k, tuple(mean.shape))).double()
        lat = mean + torch.exp(0.5 * logvar) * noise
        lat = lat.permute(0, 1, 4, 2, 3).float()  # (1, F', C, h, w)
        return lat * scaling  # invert_scale_latents=False

    if task == "reconstruction":
        condition = encode(video_u8, key_vae)
    elif task == "prediction":
        img_lat = encode(image_u8[None], key_vae)
        pad = torch.zeros(1, f_lat - 1, lat_c, h_lat, w_lat)
        condition = torch.cat([img_lat, pad], dim=1)
    else:  # planning
        img_lat = encode(image_u8[None], key_vae)
        goal_lat = encode(goal_u8[None], key_goal)
        pad = torch.zeros(1, f_lat - 2, lat_c, h_lat, w_lat)
        condition = torch.cat([img_lat, pad, goal_lat], dim=1)

    if raymap is not None:
        rm = torch.from_numpy(np.asarray(raymap, np.float32))[None]
        n = pcfg.vae_scale_factor_temporal
        if rm.shape[1] % n != 0:  # front-pad repeating the FIRST frames
            rm = torch.cat([rm[:, : n - rm.shape[1] % n], rm], dim=1)
        camera = rearrange(rm, "b (n t) c h w -> b t (n c) h w", n=n)
    else:
        camera = torch.zeros(1, f_lat, 24, h_lat, w_lat)
    condition_latents = torch.cat([condition, camera], dim=2)

    # CFG uncond masking (reference pipeline:839-855)
    if do_cfg:
        uncond = condition_latents.clone()
        if task == "planning":
            uncond[:, :, :lat_c] = 0.0
        elif task == "prediction":
            uncond[:, :1, :lat_c] = 0.0
        latent_condition = torch.cat([uncond, condition_latents], dim=0)
    else:
        latent_condition = condition_latents

    cos, sin = prepare_rotary_positional_embeddings(
        pcfg.dit, height, width, f_lat,
        vae_scale_factor_spatial=pcfg.vae_scale_factor_spatial,
        base_fps=pcfg.base_fps, fps=fps,
    )
    cos_t = torch.from_numpy(np.asarray(cos))
    sin_t = torch.from_numpy(np.asarray(sin))
    text = torch.zeros(
        (2 if do_cfg else 1), pcfg.dit.max_text_seq_length,
        pcfg.dit.text_embed_dim,
    )

    sched = NumpyCogDPM(steps)
    lat = jr(key_noise, (1, f_lat, 56, h_lat, w_lat)).astype(np.float64)
    lat *= 1.0  # init_noise_sigma
    old_x0 = None
    for i in range(steps):
        t_val = int(sched.timesteps[i])
        model_in = torch.from_numpy(
            np.broadcast_to(lat, ((2 if do_cfg else 1),) + lat.shape[1:]).copy()
        ).float()
        model_in = torch.cat([model_in, latent_condition], dim=2)
        with torch.no_grad():
            v = dit(model_in, text,
                    torch.full((model_in.shape[0],), t_val, dtype=torch.long),
                    cos_t, sin_t).double().numpy()
        if do_cfg:
            g = (dynamic_cfg(t_val, steps, guidance_scale)
                 if use_dynamic_cfg else guidance_scale)
            v = v[0:1] + g * (v[1:2] - v[0:1])
        sde_noise = jr(jax.random.fold_in(key_sde, i), lat.shape)
        lat, old_x0 = sched.step(i, lat, v, old_x0, sde_noise)

    lat = lat.astype(np.float32)

    @torch.no_grad()
    def decode(z16):  # (1, F', 16, h, w) scaled -> (F, H, W, 3)
        z = torch.from_numpy(z16 / scaling).permute(0, 2, 1, 3, 4)  # NCTHW
        # framewise mode: 2-latent-frame chunks, per-chunk stats, zq = chunk
        out = vae.decode_chunked(z, 2)  # (1, 3, F, H, W)
        return out.permute(0, 2, 3, 4, 1)[0].numpy()

    rgb = np.clip(decode(lat[:, :, :lat_c]) * 0.5 + 0.5, 0.0, 1.0)
    disp = decode(lat[:, :, lat_c : 2 * lat_c]).mean(axis=-1) * 0.5 + 0.5
    disp = np.square(disp)
    cam = torch.from_numpy(lat[:, :, 2 * lat_c :])
    raymap_out = rearrange(cam, "b t (n c) h w -> b (n t) c h w", n=4)
    raymap_out = raymap_out[:, -num_frames:][0].numpy()
    return rgb.astype(np.float32), disp.astype(np.float32), raymap_out


def main():
    pcfg = PipelineConfig.tiny()
    torch.manual_seed(0)
    dit = fill_state_dict_deterministic(TorchDiTRef(pcfg.dit), DIT_SEED).eval()
    vae = fill_state_dict_deterministic(TorchCogVAE(pcfg.vae), VAE_SEED).eval()

    F, H, W = 17, 64, 96
    rng = np.random.default_rng(404)
    video = (rng.uniform(0, 1, (F, H, W, 3)) * 255).astype(np.uint8)
    image = (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
    goal = (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
    raymap = rng.normal(size=(F, 6, H // 8, W // 8)).astype(np.float32)

    out = {"video": video, "image": image, "goal": goal, "raymap": raymap}
    specs = {
        # (steps, guidance, dynamic_cfg) — recon 4-step no-CFG, pred/plan
        # 2-step CFG with the dynamic ramp, per VERDICT r2 item 1
        "reconstruction": dict(steps=4, guidance_scale=1.0,
                               use_dynamic_cfg=False, video_u8=video),
        "prediction": dict(steps=2, guidance_scale=3.0, use_dynamic_cfg=True,
                           image_u8=image, raymap=raymap),
        "planning": dict(steps=2, guidance_scale=3.0, use_dynamic_cfg=True,
                         image_u8=image, goal_u8=goal, raymap=raymap),
    }
    for task, kw in specs.items():
        rgb, disp, rm = torch_sample(
            pcfg, dit, vae, task=task, num_frames=F, height=H, width=W,
            seed=1234, **kw,
        )
        out[f"{task}_rgb"] = rgb
        out[f"{task}_disparity"] = disp
        out[f"{task}_raymap"] = rm
        print(f"{task}: rgb{rgb.shape} disp{disp.shape} raymap{rm.shape} "
              f"rgb_mean={rgb.mean():.5f}")

    OUT.parent.mkdir(exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({OUT.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
