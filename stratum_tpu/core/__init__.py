from stratum_tpu.core import (  # noqa: F401
    distribution,
    math,
    microfacet,
    octahedral,
    quaternion,
    rng,
    spline,
    transform,
)
