"""Pipeline stages composed from ops.

- ``flow``     — dense-flow feature extraction (Farnebäck; batched
                 frame-pairs → ROI-averaged body-axis velocities).
- ``pc1``      — band-pass + sliding-window PCA → dynamic PC1 waveform.
- ``metrics``  — AUC / ADS / Kendall-τ metric head.
- ``pipeline`` — fused end-to-end program with streaming.
"""
