"""stratum_tpu.ops subpackage."""
