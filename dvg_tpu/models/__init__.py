"""Model zoo: conv backbones, recurrent latent predictors, SVGP, classifiers,
and the composite DVG model.

Reference parity map (→ /root/reference):
  layers.py       — utils.py:304-311 (init), shared conv/BN/LeakyReLU blocks
  dcgan.py        — models/dcgan_64.py, models/dcgan_128.py
  vgg.py          — models/vgg_64.py, models/vgg_128.py
  rnn.py          — models/lstm.py (lstm/gru/rnn/gaussian_lstm)
  gp.py           — models/gp_models.py (GPRegressionLayer1, gpytorch SVGP)
  classifiers.py  — models/cnn_block_frame.py, models/linear_layer.py
  dvg.py          — the assembled encoder+LSTM+GP+decoder model
"""

from dvg_tpu.models.registry import get_backbone  # noqa: F401
