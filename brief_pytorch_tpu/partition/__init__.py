"""brief_pytorch_tpu.partition"""
