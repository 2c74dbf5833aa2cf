"""brief_pytorch_tpu.train"""
