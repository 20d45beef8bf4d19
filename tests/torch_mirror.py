"""Compact torch builders used ONLY by tests to produce golden outputs.

These are freshly written from the architecture spec (kernel sizes, strides,
paddings as documented in SURVEY.md §2.4-2.6); they intentionally use a
builder style so test code stays small.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def build_torch_crnn(nclass=37, nh=256, nc=1):
    """meijieru-CRNN-compatible torch model (same state_dict keys)."""

    class BiLSTMHead(nn.Module):
        def __init__(self, nin, nhid, nout):
            super().__init__()
            self.rnn = nn.LSTM(nin, nhid, bidirectional=True)
            self.embedding = nn.Linear(nhid * 2, nout)

        def forward(self, x):
            rec, _ = self.rnn(x)
            t, b, h = rec.size()
            return self.embedding(rec.view(t * b, h)).view(t, b, -1)

    class TorchCRNN(nn.Module):
        def __init__(self):
            super().__init__()
            cnn = nn.Sequential()
            cfg = [  # (kernel, pad, out_ch, bn)
                (3, 1, 64, False), (3, 1, 128, False), (3, 1, 256, True),
                (3, 1, 256, False), (3, 1, 512, True), (3, 1, 512, False),
                (2, 0, 512, True),
            ]
            cin = nc
            for i, (k, p, cout, bn) in enumerate(cfg):
                cnn.add_module(f"conv{i}", nn.Conv2d(cin, cout, k, 1, p))
                if bn:
                    cnn.add_module(f"batchnorm{i}", nn.BatchNorm2d(cout))
                cnn.add_module(f"relu{i}", nn.ReLU(True))
                if i == 0:
                    cnn.add_module("pooling0", nn.MaxPool2d(2, 2))
                elif i == 1:
                    cnn.add_module("pooling1", nn.MaxPool2d(2, 2))
                elif i == 3:
                    cnn.add_module("pooling2", nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
                elif i == 5:
                    cnn.add_module("pooling3", nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
                cin = cout
            self.cnn = cnn
            self.rnn = nn.Sequential(BiLSTMHead(512, nh, nh), BiLSTMHead(nh, nh, nclass))

        def forward(self, x):
            conv = self.cnn(x)
            b, c, h, w = conv.size()
            assert h == 1
            return self.rnn(conv.squeeze(2).permute(2, 0, 1))

    return TorchCRNN()


def build_torch_infogen(t_emb=37, out_ch=32):
    class IG(nn.Module):
        def __init__(self):
            super().__init__()
            self.tconv1 = nn.ConvTranspose2d(t_emb, 512, 3, 2, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(512)
            self.tconv2 = nn.ConvTranspose2d(512, 128, 3, 2, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(128)
            self.tconv3 = nn.ConvTranspose2d(128, 64, 3, 2, padding=1, bias=False)
            self.bn3 = nn.BatchNorm2d(64)
            self.tconv4 = nn.ConvTranspose2d(64, out_ch, 3, (2, 1), padding=(1, 0), bias=False)
            self.bn4 = nn.BatchNorm2d(out_ch)

        def forward(self, t):
            x = F.relu(self.bn1(self.tconv1(t)))
            x = F.relu(self.bn2(self.tconv2(x)))
            x = F.relu(self.bn3(self.tconv3(x)))
            return F.relu(self.bn4(self.tconv4(x)))

    return IG()


def build_torch_srb_tl(channels=64, text_channels=32):
    """One RecurrentResidualBlockTL-compatible torch module."""

    class TGru(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 1)
            self.gru = nn.GRU(cout, cout // 2, bidirectional=True, batch_first=True)

        def forward(self, x):  # NCHW
            x = self.conv1(x)
            x = x.permute(0, 2, 3, 1).contiguous()
            b = x.size()
            x, _ = self.gru(x.view(b[0] * b[1], b[2], b[3]))
            return x.view(b[0], b[1], b[2], b[3]).permute(0, 3, 1, 2)

    class SRBTL(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(channels, channels, 3, padding=1)
            self.bn1 = nn.BatchNorm2d(channels)
            self.conv2 = nn.Conv2d(channels, channels, 3, padding=1)
            self.bn2 = nn.BatchNorm2d(channels)
            self.gru1 = TGru(channels + text_channels, channels)
            self.gru2 = TGru(channels, channels)

        def forward(self, x, temb):
            r = self.bn1(self.conv1(x))
            r = r * torch.tanh(F.softplus(r))
            r = self.bn2(self.conv2(r))
            cat = torch.cat([r, temb], 1)
            r = self.gru1(cat.transpose(-1, -2)).transpose(-1, -2)
            return self.gru2(x + r)

    return SRBTL()
