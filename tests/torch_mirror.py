"""Compact torch builders used ONLY by tests to produce golden outputs.

These are freshly written from the architecture spec (kernel sizes, strides,
paddings as documented in SURVEY.md §2.4-2.6); they intentionally use a
builder style so test code stays small.
"""

import numpy as np
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


# ---------------------------------------------------------------- recognizers


def build_torch_aster(num_classes=97, s_dim=512, att_dim=512):
    """ASTER mirror with the reference's state_dict key layout
    (encoder.layer*.*, decoder.decoder.*, stn_head.stn_*)."""

    def conv3x3_block(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, 1, 1), nn.BatchNorm2d(cout), nn.ReLU(True)
        )

    class AsterBlock(nn.Module):
        def __init__(self, cin, cout, stride=(1, 1), down=False):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 1, stride, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = (
                nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))
                if down else None
            )

        def forward(self, x):
            res = x if self.downsample is None else self.downsample(x)
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return F.relu(out + res)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.layer0 = nn.Sequential(
                nn.Conv2d(3, 32, 3, 1, 1, bias=False), nn.BatchNorm2d(32), nn.ReLU(True)
            )
            cfg = [(32, 3, (2, 2)), (64, 4, (2, 2)), (128, 6, (2, 1)),
                   (256, 6, (2, 1)), (512, 3, (2, 1))]
            cin = 32
            for li, (c, n, s) in enumerate(cfg, start=1):
                blocks = [AsterBlock(cin, c, s, down=True)]
                blocks += [AsterBlock(c, c) for _ in range(n - 1)]
                setattr(self, f"layer{li}", nn.Sequential(*blocks))
                cin = c
            self.rnn = nn.LSTM(512, 256, bidirectional=True, num_layers=2, batch_first=True)

        def forward(self, x):
            for li in range(6):
                x = getattr(self, f"layer{li}")(x)
            feat = x.squeeze(2).transpose(2, 1)
            out, _ = self.rnn(feat)
            return out

    class AttentionUnit(nn.Module):
        def __init__(self):
            super().__init__()
            self.sEmbed = nn.Linear(s_dim, att_dim)
            self.xEmbed = nn.Linear(512, att_dim)
            self.wEmbed = nn.Linear(att_dim, 1)

        def forward(self, x, s_prev):
            xp = self.xEmbed(x)
            sp = self.sEmbed(s_prev).unsqueeze(1)
            v = self.wEmbed(torch.tanh(xp + sp)).squeeze(-1)
            return F.softmax(v, dim=1)

    class DecoderUnit(nn.Module):
        def __init__(self):
            super().__init__()
            self.attention_unit = AttentionUnit()
            self.tgt_embedding = nn.Embedding(num_classes + 1, att_dim)
            self.gru = nn.GRU(512 + att_dim, s_dim, batch_first=True)
            self.fc = nn.Linear(s_dim, num_classes)

        def forward(self, x, state, y_prev):
            alpha = self.attention_unit(x, state.squeeze(0))
            context = torch.bmm(alpha.unsqueeze(1), x).squeeze(1)
            yp = self.tgt_embedding(y_prev.long())
            out, state = self.gru(torch.cat([yp, context], 1).unsqueeze(1), state)
            return self.fc(out.squeeze(1)), state

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.decoder = DecoderUnit()

        def sample(self, x, max_len):
            b = x.size(0)
            state = torch.zeros(1, b, s_dim)
            y = torch.full((b,), num_classes, dtype=torch.long)
            ids, scores = [], []
            for _ in range(max_len):
                logits, state = self.decoder(x, state, y)
                p = F.softmax(logits, 1)
                sc, y = p.max(1)
                ids.append(y)
                scores.append(sc)
            return torch.stack(ids, 1), torch.stack(scores, 1)

    class StnHead(nn.Module):
        def __init__(self):
            super().__init__()
            self.stn_convnet = nn.Sequential(
                conv3x3_block(3, 32), nn.MaxPool2d(2, 2),
                conv3x3_block(32, 64), nn.MaxPool2d(2, 2),
                conv3x3_block(64, 128), nn.MaxPool2d(2, 2),
                conv3x3_block(128, 256), nn.MaxPool2d(2, 2),
                conv3x3_block(256, 256), nn.MaxPool2d(2, 2),
                conv3x3_block(256, 256),
            )
            self.stn_fc1 = nn.Sequential(nn.Linear(512, 512), nn.BatchNorm1d(512), nn.ReLU(True))
            self.stn_fc2 = nn.Linear(512, 40)
            self.stn_fc2.weight.data.zero_()

        def forward(self, x):
            x = self.stn_convnet(x)
            x = x.reshape(x.size(0), -1)
            f = F.relu(self.stn_fc1[1](self.stn_fc1[0](x)))
            pts = self.stn_fc2(0.1 * f)
            return f, pts.view(-1, 20, 2)

    class Builder(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Head()
            self.stn_head = StnHead()

    return Builder()


def build_torch_moran(nclass=37, nh=256):
    """MORAN mirror with the reference key layout (MORN.cnn.N, ASRN.*)."""

    class MORN(nn.Module):
        def __init__(self):
            super().__init__()
            self.cnn = nn.Sequential(
                nn.MaxPool2d(2, 2),
                nn.Conv2d(1, 64, 3, 1, 1), nn.BatchNorm2d(64), nn.ReLU(True), nn.MaxPool2d(2, 2),
                nn.Conv2d(64, 128, 3, 1, 1), nn.BatchNorm2d(128), nn.ReLU(True), nn.MaxPool2d(2, 2),
                nn.Conv2d(128, 64, 3, 1, 1), nn.BatchNorm2d(64), nn.ReLU(True),
                nn.Conv2d(64, 16, 3, 1, 1), nn.BatchNorm2d(16), nn.ReLU(True),
                nn.Conv2d(16, 1, 3, 1, 1), nn.BatchNorm2d(1),
            )
            self.pool = nn.MaxPool2d(2, 1)
            h, w = 32, 100
            hl = np.arange(h) * 2.0 / (h - 1) - 1
            wl = np.arange(w) * 2.0 / (w - 1) - 1
            gx, gy = np.meshgrid(wl, hl)
            grid = torch.from_numpy(np.stack([gx, gy], -1)[None].astype(np.float32))
            self.register_buffer("grid", grid)

        def forward(self, x, enhance=1):
            b = x.size(0)
            grid = self.grid.expand(b, -1, -1, -1)
            gx, gy = grid[..., 0:1], grid[..., 1:2]
            xs = F.interpolate(x, (32, 100), mode="bilinear", align_corners=False)
            off = self.cnn(xs)
            offp = self.pool(F.relu(off)) - self.pool(F.relu(-off))
            offg = F.grid_sample(offp, grid, align_corners=False).permute(0, 2, 3, 1)
            sg = torch.cat([gx, gy + offg], 3)
            xr = F.grid_sample(x, sg, align_corners=False)
            for _ in range(enhance):
                off = self.cnn(xr)
                offp = self.pool(F.relu(off)) - self.pool(F.relu(-off))
                offg = offg + F.grid_sample(offp, grid, align_corners=False).permute(0, 2, 3, 1)
                sg = torch.cat([gx, gy + offg], 3)
                xr = F.grid_sample(x, sg, align_corners=False)
            return xr

    class ResBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            down = (stride[0] if isinstance(stride, tuple) else stride) > 1
            if down:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 3, stride, 1), nn.BatchNorm2d(cout, momentum=0.01)
                )
                self.conv1 = nn.Sequential(
                    nn.Conv2d(cin, cout, 3, stride, 1), nn.BatchNorm2d(cout, momentum=0.01)
                )
            else:
                self.downsample = None
                self.conv1 = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, 0), nn.BatchNorm2d(cout, momentum=0.01)
                )
            self.conv2 = nn.Sequential(
                nn.Conv2d(cout, cout, 3, 1, 1), nn.BatchNorm2d(cout, momentum=0.01)
            )

        def forward(self, x):
            res = x if self.downsample is None else self.downsample(x)
            return F.relu(res + self.conv2(self.conv1(x)))

    class ResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.block0 = nn.Sequential(nn.Conv2d(1, 32, 3, 1, 1), nn.BatchNorm2d(32, momentum=0.01))
            cfg = [(32, 32, (2, 2), 3), (32, 64, (2, 2), 4), (64, 128, (2, 1), 6),
                   (128, 256, (2, 1), 6), (256, 512, (2, 1), 3)]
            for i, (cin, cout, s, n) in enumerate(cfg, start=1):
                blocks = [ResBlock(cin, cout, s)] + [ResBlock(cout, cout, 1) for _ in range(n - 1)]
                setattr(self, f"block{i}", nn.Sequential(*blocks))

        def forward(self, x):
            for i in range(6):
                x = getattr(self, f"block{i}")(x)
            return x

    class BiLSTMHead(nn.Module):
        def __init__(self, nin, nhid, nout):
            super().__init__()
            self.rnn = nn.LSTM(nin, nhid, bidirectional=True)
            self.embedding = nn.Linear(nhid * 2, nout)

        def forward(self, x):
            rec, _ = self.rnn(x)
            t, b, h = rec.size()
            return self.embedding(rec.view(t * b, h)).view(t, b, -1)

    class AttentionCell(nn.Module):
        def __init__(self):
            super().__init__()
            self.i2h = nn.Linear(nh, nh, bias=False)
            self.h2h = nn.Linear(nh, nh)
            self.score = nn.Linear(nh, 1, bias=False)
            self.rnn = nn.GRUCell(nh + 256, nh)

        def forward(self, prev_hidden, feats, cur_emb):
            nT, nB, nC = feats.shape
            fp = self.i2h(feats.view(-1, nC))
            hp = self.h2h(prev_hidden).view(1, nB, nh).expand(nT, nB, nh).reshape(-1, nh)
            e = self.score(torch.tanh(fp + hp)).view(nT, nB)
            alpha = F.softmax(e, 0)
            ctx = (feats * alpha.view(nT, nB, 1)).sum(0)
            return self.rnn(torch.cat([ctx, cur_emb], 1), prev_hidden), alpha

    class Attention(nn.Module):
        def __init__(self):
            super().__init__()
            self.attention_cell = AttentionCell()
            self.generator = nn.Linear(nh, nclass)
            self.char_embeddings = nn.Parameter(torch.randn(nclass + 1, 256))

        def forward(self, feats, steps=20):
            nT, nB, nC = feats.shape
            hidden = torch.zeros(nB, nh)
            tgt = torch.zeros(nB, dtype=torch.long)
            probs = []
            for _ in range(steps):
                emb = self.char_embeddings.index_select(0, tgt)
                hidden, _ = self.attention_cell(hidden, feats, emb)
                lg = self.generator(hidden)
                probs.append(lg)
                tgt = lg.max(1)[1] + 1
            return torch.stack(probs, 1)

    class ASRN(nn.Module):
        def __init__(self):
            super().__init__()
            self.cnn = ResNet()
            self.rnn = nn.Sequential(BiLSTMHead(512, nh, nh), BiLSTMHead(nh, nh, nh))
            self.attentionL2R = Attention()
            self.attentionR2L = Attention()

        def forward(self, x):
            conv = self.cnn(x)
            conv = conv.squeeze(2).permute(2, 0, 1)
            rnn = self.rnn(conv)
            # R2L attends over the SAME features (asrn_res.py:258-260 only
            # reverses the teacher text, which the test path never uses)
            return self.attentionL2R(rnn), self.attentionR2L(rnn)

    class MORAN(nn.Module):
        def __init__(self):
            super().__init__()
            self.MORN = MORN()
            self.ASRN = ASRN()

        def forward(self, x):
            return self.ASRN(self.MORN(x))

    return MORAN()


def build_torch_opt(nclass=37, oc=512):
    """None-ResNet-None-CTC mirror (FeatureExtraction.ConvNet.*, Prediction)."""

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1, down=False):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = (
                nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))
                if down else None
            )

        def forward(self, x):
            res = x if self.downsample is None else self.downsample(x)
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return F.relu(out + res)

    class ConvNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0_1 = nn.Conv2d(1, oc // 16, 3, 1, 1, bias=False)
            self.bn0_1 = nn.BatchNorm2d(oc // 16)
            self.conv0_2 = nn.Conv2d(oc // 16, oc // 8, 3, 1, 1, bias=False)
            self.bn0_2 = nn.BatchNorm2d(oc // 8)
            self.maxpool1 = nn.MaxPool2d(2, 2)
            blocks = [oc // 4, oc // 2, oc, oc]
            layers = [1, 2, 5, 3]
            cin = oc // 8
            for si, (c, n) in enumerate(zip(blocks, layers), start=1):
                seq = [BasicBlock(cin, c, down=(cin != c))] + [BasicBlock(c, c) for _ in range(n - 1)]
                setattr(self, f"layer{si}", nn.Sequential(*seq))
                cin = c
                if si < 4:
                    setattr(self, f"conv{si}", nn.Conv2d(c, c, 3, 1, 1, bias=False))
                    setattr(self, f"bn{si}", nn.BatchNorm2d(c))
            self.maxpool2 = nn.MaxPool2d(2, 2)
            self.maxpool3 = nn.MaxPool2d(2, (2, 1), (0, 1))
            self.conv4_1 = nn.Conv2d(oc, oc, 2, (2, 1), (0, 1), bias=False)
            self.bn4_1 = nn.BatchNorm2d(oc)
            self.conv4_2 = nn.Conv2d(oc, oc, 2, 1, 0, bias=False)
            self.bn4_2 = nn.BatchNorm2d(oc)

        def forward(self, x):
            x = F.relu(self.bn0_1(self.conv0_1(x)))
            x = F.relu(self.bn0_2(self.conv0_2(x)))
            x = self.maxpool1(x)
            x = self.layer1(x)
            x = F.relu(self.bn1(self.conv1(x)))
            x = self.maxpool2(x)
            x = self.layer2(x)
            x = F.relu(self.bn2(self.conv2(x)))
            x = self.maxpool3(x)
            x = self.layer3(x)
            x = F.relu(self.bn3(self.conv3(x)))
            x = self.layer4(x)
            x = F.relu(self.bn4_1(self.conv4_1(x)))
            x = F.relu(self.bn4_2(self.conv4_2(x)))
            return x

    class FE(nn.Module):
        def __init__(self):
            super().__init__()
            self.ConvNet = ConvNet()

        def forward(self, x):
            return self.ConvNet(x)

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.FeatureExtraction = FE()
            self.AdaptiveAvgPool = nn.AdaptiveAvgPool2d((None, 1))
            self.Prediction = nn.Linear(oc, nclass)

        def forward(self, x):
            v = self.FeatureExtraction(x)
            v = self.AdaptiveAvgPool(v.permute(0, 3, 1, 2)).squeeze(3)
            return self.Prediction(v).permute(1, 0, 2)

    return Model()


def build_torch_tsrn_tl(srb_nums=5, hidden_units=32, mask=True, text_emb=37,
                        out_text_channels=32, scale_factor=2):
    """Full TSRN_TL mirror with the reference state_dict key layout
    (block1.0/.1, blockK.{conv1,bn1,gru1.conv1,gru1.gru,conv2,bn2,gru2.*},
    infoGen.tconvK/bnK, block7.0/.1, block8.{k}.conv + final conv)."""
    import math

    in_planes = 4 if mask else 3
    ch = 2 * hidden_units

    def mish(x):
        return x * torch.tanh(F.softplus(x))

    class GruBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 1)
            self.gru = nn.GRU(cout, cout // 2, bidirectional=True, batch_first=True)

        def forward(self, x):
            x = self.conv1(x)
            x = x.permute(0, 2, 3, 1).contiguous()
            b = x.size()
            x = x.view(b[0] * b[1], b[2], b[3])
            x, _ = self.gru(x)
            x = x.view(b[0], b[1], b[2], b[3])
            return x.permute(0, 3, 1, 2)

    class SRBTL(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(ch, ch, 3, padding=1)
            self.bn1 = nn.BatchNorm2d(ch)
            self.gru1 = GruBlock(ch + out_text_channels, ch)
            self.conv2 = nn.Conv2d(ch, ch, 3, padding=1)
            self.bn2 = nn.BatchNorm2d(ch)
            self.gru2 = GruBlock(ch, ch)

        def forward(self, x, t):
            r = self.bn1(self.conv1(x))
            r = mish(r)
            r = self.bn2(self.conv2(r))
            cat = torch.cat([r, t], 1)
            r = self.gru1(cat.transpose(-1, -2)).transpose(-1, -2)
            return self.gru2(x + r)

    class InfoGen(nn.Module):
        def __init__(self):
            super().__init__()
            self.tconv1 = nn.ConvTranspose2d(text_emb, 512, 3, 2, bias=False)
            self.bn1 = nn.BatchNorm2d(512)
            self.tconv2 = nn.ConvTranspose2d(512, 128, 3, 2, bias=False)
            self.bn2 = nn.BatchNorm2d(128)
            self.tconv3 = nn.ConvTranspose2d(128, 64, 3, 2, padding=1, bias=False)
            self.bn3 = nn.BatchNorm2d(64)
            self.tconv4 = nn.ConvTranspose2d(64, out_text_channels, 3, (2, 1), padding=1, bias=False)
            self.bn4 = nn.BatchNorm2d(out_text_channels)

        def forward(self, t):
            x = F.relu(self.bn1(self.tconv1(t)))
            x = F.relu(self.bn2(self.tconv2(x)))
            x = F.relu(self.bn3(self.tconv3(x)))
            return F.relu(self.bn4(self.tconv4(x)))

    class Up(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(ch, ch * 4, 3, padding=1)
            self.pixel_shuffle = nn.PixelShuffle(2)

        def forward(self, x):
            return mish(self.pixel_shuffle(self.conv(x)))

    class TSRN_TL(nn.Module):
        def __init__(self):
            super().__init__()
            self.srb_nums = srb_nums
            self.block1 = nn.Sequential(nn.Conv2d(in_planes, ch, 9, padding=4), nn.PReLU())
            for i in range(srb_nums):
                setattr(self, f"block{i + 2}", SRBTL())
            self.infoGen = InfoGen()
            setattr(self, f"block{srb_nums + 2}", nn.Sequential(
                nn.Conv2d(ch, ch, 3, padding=1), nn.BatchNorm2d(ch)))
            ups = [Up() for _ in range(int(math.log2(scale_factor)))]
            ups.append(nn.Conv2d(ch, in_planes, 9, padding=4))
            setattr(self, f"block{srb_nums + 3}", nn.Sequential(*ups))

        def forward(self, x, text_emb):
            b1 = self.block1(x)
            sp = self.infoGen(text_emb)
            sp = F.interpolate(sp, (x.shape[2], x.shape[3]), mode="bilinear",
                               align_corners=True)
            b = b1
            for i in range(self.srb_nums):
                b = getattr(self, f"block{i + 2}")(b, sp)
            b = getattr(self, f"block{self.srb_nums + 2}")(b)
            b = getattr(self, f"block{self.srb_nums + 3}")(b1 + b)
            return torch.tanh(b)

    return TSRN_TL()
