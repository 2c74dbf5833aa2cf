"""brief_pytorch_tpu.cli"""
