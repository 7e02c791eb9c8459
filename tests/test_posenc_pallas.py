"""Fused field-input builder vs the reference chain (code.py + concat)."""

import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.models.code import PositionalEncoding
from pixelnerf_tpu.ops.posenc_pallas import posenc_concat, posenc_supported


def _reference_chain(base, vd, num_freqs, freq_factor, dtype):
    code = PositionalEncoding(
        num_freqs=num_freqs, d_in=3, freq_factor=freq_factor,
        include_input=True,
    )
    z = code.apply({}, base)
    return jnp.concatenate([z, vd], axis=1).astype(dtype)


def test_posenc_concat_matches_reference_chain():
    rng = np.random.default_rng(0)
    M = 3000  # non-multiple of the tile: exercises padding
    base = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    for ff in (1.5, float(np.pi)):
        want = _reference_chain(base, vd, 6, ff, jnp.bfloat16)
        got = posenc_concat(base, vd, 6, ff, interpret=True)
        assert got.shape == (M, 42) and got.dtype == jnp.bfloat16
        w = np.asarray(want, np.float32)
        g = np.asarray(got, np.float32)
        # identical math; FMA fusion inside the kernel can move a sin
        # input by 1 f32 ulp, which lands ~0.03% of outputs on the
        # neighboring bf16 value — bound count and size, not exact bits
        mismatch = np.abs(w - g) > 0
        assert mismatch.mean() < 1e-3, mismatch.mean()
        np.testing.assert_allclose(g, w, rtol=1.6e-2, atol=1e-4)


def test_posenc_concat_f32_and_other_freq_counts():
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.normal(size=(257, 3)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(257, 3)).astype(np.float32))
    want = _reference_chain(base, vd, 4, 2.0, jnp.float32)
    got = posenc_concat(base, vd, 4, 2.0, out_dtype=jnp.float32, interpret=True)
    assert got.shape == (257, 3 + 24 + 3)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-6)


def test_posenc_supported_gate():
    assert posenc_supported(3, 6, True)
    assert not posenc_supported(3, 6, False)
    assert not posenc_supported(1, 6, True)


def test_model_gate_is_static_and_off_on_cpu():
    """On the CPU backend the model must keep the exact XLA chain."""
    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.utils.hocon import load as hload

    model = make_model(hload("conf/exp/srn.conf")["model"])
    assert model.dtype == jnp.bfloat16
    assert not model._posenc_fused_ok()  # backend is cpu under tests
