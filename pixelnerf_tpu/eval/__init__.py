from pixelnerf_tpu.eval.render_utils import make_chunk_renderer, render_full  # noqa: F401
