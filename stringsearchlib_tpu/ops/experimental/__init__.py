"""Hardware-validated but UNWIRED Pallas kernels, kept out of the
production dispatch path.

- ``dp_pallas``: semi-global edit-distance DP; loses to the XLA
  scan+cummin formulation by ~1.4x at short-tier widths (lane waste).
- ``vgather``: VMEM-staged arbitrary-index table gather; does not lower
  on current Mosaic (no flat-index VMEM gather).

Nothing in the engine imports this package; the production Pallas
content is ``ops.bitmap_matmul`` (bit-packed incidence unpack-matmul).
"""
