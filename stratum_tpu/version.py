"""Version constants (reference: src/CMakeLists.txt:23 defines 1.5)."""

STRATUM_VERSION_MAJOR = 0
STRATUM_VERSION_MINOR = 1
