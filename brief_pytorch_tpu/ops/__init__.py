"""brief_pytorch_tpu.ops"""
