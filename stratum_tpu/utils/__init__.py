"""stratum_tpu.utils subpackage."""
