from isph_tpu.models import driver, tgv
