from isph_tpu.physics import ns_projection, shift, status
