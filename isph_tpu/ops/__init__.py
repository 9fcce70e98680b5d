from isph_tpu.ops import kernels, neighbors, corrected, ell
