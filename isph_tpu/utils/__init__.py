from isph_tpu.utils import packed
