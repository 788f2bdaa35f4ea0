"""deepards_tpu: a TPU-native (JAX/XLA/Pallas) framework for ARDS detection
from mechanical-ventilator waveform data.

This is a ground-up rebuild of the capabilities of the reference
``deepards`` research framework (see /root/reference) designed for TPU:

- ETL is one-shot vectorized preprocessing into dense array caches
  (``deepards_tpu.data``) instead of per-item Python loops.
- Models are pure-functional flax modules whose per-window CNN backbone is
  evaluated as one large batched convolution on the MXU instead of a Python
  loop over the batch dimension (reference:
  deepards/models/torch_cnn_linear_network.py:104-113).
- Training/eval steps are jit-compiled and sharded over a
  ``jax.sharding.Mesh`` (``deepards_tpu.parallel``).
- Hot non-NN compute (DTW scoring) is a Pallas TPU kernel
  (``deepards_tpu.ops``).
"""

__version__ = "0.1.0"
