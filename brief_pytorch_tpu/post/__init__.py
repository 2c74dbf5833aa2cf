"""brief_pytorch_tpu.post"""
