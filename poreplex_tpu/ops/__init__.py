"""TPU compute kernels (JAX/XLA/Pallas) for poreplex-tpu.

Every hot numeric path of the reference pipeline lives here as a batched,
jit-compiled kernel:

  rnn              LSTM scan cells (scaler + demux networks)
  viterbi          batched masked HMM Viterbi + segment-extent extraction
  event_detection  two-window t-statistic event segmentation (scrappie-style)
  polya_dp         best poly(A)-interval dynamic program
  normalize        pooling, masked median/MAD, median filter
"""
