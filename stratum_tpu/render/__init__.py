"""stratum_tpu.render subpackage."""
