"""brief_pytorch_tpu.utils"""
