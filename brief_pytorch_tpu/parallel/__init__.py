"""brief_pytorch_tpu.parallel"""
