"""Parity test for the RETIRED Pallas fusion experiment (SURVEY.md
§7.3 M7 — see kernels/pallas_fused.py header for the measurements
that retired it). Kept so the kernel stays re-measurable: it pins the
full C1-C5 fused path (fused_pipeline_z) against the production XLA
path. TPU only — set MP3TPU_TEST_PLATFORM=tpu."""
import os

import numpy as np
import pytest

import fixtures

requires_tpu = pytest.mark.skipif(
    os.environ.get("MP3TPU_TEST_PLATFORM", "cpu") != "tpu",
    reason="Pallas kernels require the TPU backend")


@requires_tpu
@pytest.mark.parametrize("name", ["sweep", "transients"])
def test_pallas_matches_xla(name):
    import jax.numpy as jnp
    from mp3tpu.bitstream.unpack import unpack
    from mp3tpu.kernels import pipeline as kp
    mp3 = fixtures.lame_fixture(name, ch=2, bitrate=128, mode="jstereo")
    st = unpack(mp3)
    args = (jnp.asarray(st.is_[:32][None]), jnp.asarray(st.exp[:32][None]),
            jnp.asarray(st.block_type[:32][None]),
            jnp.asarray(st.mixed[:32][None]), jnp.asarray(st.smode[:32][None]))
    a, _ = kp._jitted_for(44100, False, False)(*args, kp.init_state(1))
    b, _ = kp._jitted_for(44100, False, True)(*args, kp.init_state(1))
    d = np.abs(np.asarray(a) - np.asarray(b))
    assert d.max() < 5e-4  # MXU tiling reassociation tolerance
