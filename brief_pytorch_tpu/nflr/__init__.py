"""brief_pytorch_tpu.nflr"""
