"""Native npz prefetch loader: parity with np.load, ordering, error policy."""

import numpy as np
import pytest

from aether_tpu import runtime


pytestmark = pytest.mark.skipif(
    not runtime.available(),
    reason=f"native loader unavailable: {runtime.build_error()}",
)


def test_load_npz_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    ref = {
        "clean_latents": rng.normal(size=(3, 56, 8, 12)).astype(np.float16),
        "num_frames": np.asarray(17),
        "height": np.asarray(64),
        "fps": np.asarray(12),
        "text_embeds": np.zeros((0,), np.float16),
        "bytes8": rng.integers(0, 255, size=(7,), dtype=np.uint8),
    }
    path = tmp_path / "clip.npz"
    np.savez_compressed(path, **ref)
    got = runtime.load_npz(str(path))
    assert set(got) == set(ref)
    for key, val in ref.items():
        assert got[key].dtype == val.dtype, key
        np.testing.assert_array_equal(got[key], val)

    # uncompressed container too (zip method 0)
    path2 = tmp_path / "stored.npz"
    np.savez(path2, **ref)
    got2 = runtime.load_npz(str(path2))
    np.testing.assert_array_equal(got2["clean_latents"], ref["clean_latents"])


def test_prefetcher_delivers_in_submit_order(tmp_path):
    paths = []
    for i in range(8):
        p = tmp_path / f"c{i}.npz"
        np.savez_compressed(p, x=np.full((4, 4), i, np.float32))
        paths.append(str(p))
    pf = runtime.NpzPrefetcher(n_threads=3)
    for p in paths:
        pf.submit(p)
    for i in range(8):
        assert pf.get()["x"][0, 0] == i
    pf.close()


def test_load_errors_surface(tmp_path):
    bad = tmp_path / "not_a_zip.npz"
    bad.write_bytes(b"garbage")
    with pytest.raises(IOError):
        runtime.load_npz(str(bad))
    with pytest.raises(IOError):
        runtime.load_npz(str(tmp_path / "missing.npz"))


def test_latent_batches_uses_prefetch(tmp_path):
    """End to end through the training loader (native path active)."""
    from aether_tpu.config import DiTConfig
    from aether_tpu.train.data import latent_batches

    rng = np.random.default_rng(1)
    for i in range(4):
        np.savez_compressed(
            tmp_path / f"clip_{i}.npz",
            clean_latents=rng.normal(size=(2, 56, 8, 12)).astype(np.float16),
            num_frames=np.asarray(5),
            height=np.asarray(64),
            width=np.asarray(96),
            fps=np.asarray(12),
            text_embeds=np.zeros((0,), np.float16),
        )
    cfg = DiTConfig.tiny()
    it = latent_batches(str(tmp_path), cfg, batch_size=2, seed=0)
    seen = [next(it) for _ in range(4)]
    for batch in seen:
        assert batch["clean_latents"].shape == (2, 2, 56, 8, 12)
        assert batch["condition_latents"].shape == (2, 2, 40, 8, 12)
        assert np.all(np.isfinite(batch["clean_latents"]))

    # determinism: same seed -> same stream (native prefetch on and off)
    it_a = latent_batches(str(tmp_path), cfg, batch_size=2, seed=3)
    it_b = latent_batches(str(tmp_path), cfg, batch_size=2, seed=3,
                          native_prefetch=False)
    for _ in range(3):
        a, b = next(it_a), next(it_b)
        np.testing.assert_array_equal(a["clean_latents"], b["clean_latents"])
        np.testing.assert_array_equal(a["condition_latents"],
                                      b["condition_latents"])
