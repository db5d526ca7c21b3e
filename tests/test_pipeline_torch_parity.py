"""END-TO-END cross-framework parity: the full JAX sampler vs the committed
torch sampler goldens (scripts/make_pipeline_goldens.py).

Per-module parity (DiT block goldens, VAE stage goldens, scheduler goldens)
cannot see a WIRING slip between individually-correct modules. This test pins
the complete path — condition encode, latent packing order (reference
``pipeline:666-670``), per-task CFG uncond masking (``:839-855``), the
SDE-DPM++(2M) loop with second-order chaining and the dynamic-CFG ``t.item()``
ramp (``:879-893,901-915``), RGB+disparity decode, the disparity square
(``:936-939``) and the raymap unfold (``:942-949``) — for all three tasks
against an independent torch implementation, within f32 tolerance.

The torch side injected the SAME threaded-PRNG noise streams the JAX pipeline
draws (key -> (vae, goal, denoise) -> (init, sde) splits), so a change to the
pipeline's key discipline fails here loudly; regenerate the fixture after
auditing such a change.
"""

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aether_tpu.config import PipelineConfig
from aether_tpu.io.weights import convert_dit_state_dict, convert_vae_state_dict
from aether_tpu.pipeline import AetherPipeline

_FIX = pathlib.Path(__file__).parent / "fixtures" / "pipeline_e2e_goldens.npz"

SEED = 1234  # must match scripts/make_pipeline_goldens.py


@pytest.fixture(scope="module")
def golden():
    if not _FIX.exists():
        pytest.skip("pipeline e2e golden fixture not generated")
    return np.load(_FIX)


@pytest.fixture(scope="module")
def pipe():
    from test_torch_parity import TorchDiTRef, fill_state_dict_deterministic
    from test_vae_torch_parity import TorchCogVAE

    cfg = PipelineConfig.tiny()
    dit = fill_state_dict_deterministic(TorchDiTRef(cfg.dit), 20240817).eval()
    vae = fill_state_dict_deterministic(TorchCogVAE(cfg.vae), 913).eval()
    dit_params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x, np.float32)),
        convert_dit_state_dict(dit.state_dict(), cfg.dit),
    )
    vae_params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x, np.float32)),
        convert_vae_state_dict(vae.state_dict(), cfg.vae),
    )
    text = np.zeros((1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim),
                    np.float32)
    return AetherPipeline(cfg, dit_params, vae_params, text,
                          compute_dtype=jnp.float32)


def _check(out, golden, task, atol_img, atol_raymap):
    """f32 XLA-vs-torch accumulation noise compounds over the denoise loop;
    a wiring slip (wrong packing order, wrong mask, missing square, wrong
    unfold stride) shifts outputs by >1e-1, orders of magnitude above these
    gates."""
    rgb_diff = float(np.max(np.abs(out.rgb - golden[f"{task}_rgb"])))
    disp_diff = float(np.max(np.abs(out.disparity
                                    - golden[f"{task}_disparity"])))
    ray_diff = float(np.max(np.abs(out.raymap - golden[f"{task}_raymap"])))
    assert rgb_diff < atol_img, f"{task} rgb drifted: {rgb_diff}"
    assert disp_diff < atol_img, f"{task} disparity drifted: {disp_diff}"
    assert ray_diff < atol_raymap, f"{task} raymap drifted: {ray_diff}"


def test_reconstruction_e2e_matches_torch(golden, pipe):
    out = pipe(task="reconstruction", video=golden["video"], height=64,
               width=96, num_frames=17, num_inference_steps=4, fps=12,
               seed=SEED)
    _check(out, golden, "reconstruction", atol_img=5e-3, atol_raymap=5e-3)


def test_prediction_e2e_matches_torch(golden, pipe):
    out = pipe(task="prediction", image=golden["image"],
               raymap=golden["raymap"], height=64, width=96, num_frames=17,
               num_inference_steps=2, fps=12, seed=SEED)
    # prediction/planning defaults: guidance 3.0 + dynamic CFG (exercised)
    _check(out, golden, "prediction", atol_img=5e-3, atol_raymap=5e-3)


def test_planning_e2e_matches_torch(golden, pipe):
    out = pipe(task="planning", image=golden["image"], goal=golden["goal"],
               raymap=golden["raymap"], height=64, width=96, num_frames=17,
               num_inference_steps=2, fps=12, seed=SEED)
    _check(out, golden, "planning", atol_img=5e-3, atol_raymap=5e-3)
