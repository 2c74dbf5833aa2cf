"""brief_pytorch_tpu.io"""
