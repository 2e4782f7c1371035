"""Host-side IO: video decode + prefetch, and the reference file contracts."""
