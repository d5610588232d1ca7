"""dvbs2rx_tpu — a TPU-native DVB-S2/S2X software-defined-radio framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of gr-dvbs2rx:
IQ samples in, MPEG transport stream out, with batched multi-channel
receivers sharded over TPU meshes.
"""

__version__ = "0.1.0"
