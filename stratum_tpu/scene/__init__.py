"""stratum_tpu.scene subpackage."""
