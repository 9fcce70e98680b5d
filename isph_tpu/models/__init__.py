from isph_tpu.models import channel, driver, edl, geometry, tgv
