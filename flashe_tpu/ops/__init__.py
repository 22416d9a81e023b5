"""TPU compute kernels: AES, mask streams, lane arithmetic, quantization,
bit packing, bignum/NTT baselines."""
