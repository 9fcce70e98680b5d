from isph_tpu.ops import corrected, ell, kernels, mls, neighbors
