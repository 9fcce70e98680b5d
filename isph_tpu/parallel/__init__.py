from isph_tpu.parallel import dist, mesh
