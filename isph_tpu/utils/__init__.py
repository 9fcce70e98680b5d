from isph_tpu.utils import dense, packed, profiling, time_bdf
