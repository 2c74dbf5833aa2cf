"""brief_pytorch_tpu.eval"""
