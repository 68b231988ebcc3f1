"""Model family wrappers: pre-trained networks and HMMs used by the pipeline.

  scaler        LSTM48-LSTM48-Dense2 signal scaling predictor
  demux         BiLSTM48-LSTM64-Dense5 barcode classifier
  segmentation  6-state Normal/GMM HMMs (segmentation + unsplit detection)
"""
