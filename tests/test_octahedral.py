import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import octahedral as octa


def test_roundtrip_random(rng_np):
    n = rng_np.normal(size=(5000, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    p = octa.pack_unit(jnp.asarray(n))
    n2 = np.asarray(octa.unpack_unit(p))
    # snorm16 quantization: ~1e-4 angular error
    dots = np.sum(n * n2, axis=-1)
    assert dots.min() > 0.99999


def test_roundtrip_axes():
    axes = np.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    )
    p = octa.pack_unit(jnp.asarray(axes))
    n2 = np.asarray(octa.unpack_unit(p))
    np.testing.assert_allclose(n2, axes, atol=1e-3)
