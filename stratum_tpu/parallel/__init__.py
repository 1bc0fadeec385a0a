"""stratum_tpu.parallel subpackage."""
