"""Training: Caffe-semantics SGD, the jitted solver loop, checkpoints."""
