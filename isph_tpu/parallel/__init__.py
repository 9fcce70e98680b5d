from isph_tpu.parallel import mesh
