"""stratum_tpu.tools: CLI utilities (image compare, inspect)."""
