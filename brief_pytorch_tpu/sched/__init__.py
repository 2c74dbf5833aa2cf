"""brief_pytorch_tpu.sched"""
