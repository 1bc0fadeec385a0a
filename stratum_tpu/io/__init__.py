"""stratum_tpu.io subpackage."""
