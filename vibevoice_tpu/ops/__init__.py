"""TPU ops: causal convs, Pallas attention kernels, fused block chains."""
