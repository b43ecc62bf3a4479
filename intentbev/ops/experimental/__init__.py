"""Measured-negative experimental kernels, kept as experiment records.

These are real, tested Pallas implementations that LOST on-chip when wired
into the production model; they live here (not in `intentbev.ops`) so the
production tree carries only live kernels. Numbers from v5e, 2026-08:

- ``fused_proj.fused_dense_residual`` — attention out-projection with the
  residual add (and drop-path gate) folded into the matmul epilogue.
  Full-model: 52.3 -> 51.7 fps inference, 720 -> 722 ms/step training.
  XLA already fuses the residual add into the Dense epilogue there.
- ``flash_int8.flash_attention_packed_int8`` — W8A8 int8 flash attention.
  Sublayer micro [8, 4608, 384]: 6.06 ms int8 vs 4.83 ms bf16. The QK^T
  contraction is only 64 deep, so the int8 MXU rate is unreachable and
  quantizing Q/K/V + the P tile costs more than the P@V win. End-to-end
  with int8 qkv/proj denses: 51.4 vs 52.2 fps (breaks XLA epilogue fusion).

Tests: ``tests/test_fused_proj.py``, ``tests/test_int8.py``.
"""
