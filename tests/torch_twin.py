"""A compact torch implementation of the PARSeq architecture for parity tests.

Written from the architecture spec (SURVEY.md §2.2 / reference
strhub/models/parseq/{model,modules}.py) with state_dict keys matching the
reference schema, so it doubles as a fixture for the checkpoint converter:
converting this twin's state_dict must reproduce its outputs exactly.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class TwinViTBlock(nn.Module):
    def __init__(self, d, heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.heads = heads
        self.norm2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, int(d * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(d * mlp_ratio), d)

    def forward(self, x):
        B, N, D = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        o = F.scaled_dot_product_attention(q, k, v)
        x = x + self.attn.proj(o.transpose(1, 2).reshape(B, N, D))
        x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class TwinEncoder(nn.Module):
    """timm-ViT-equivalent: patch conv + pos embed + blocks + final LN."""

    def __init__(self, img_size, patch_size, d, depth, heads, mlp_ratio, class_token=False):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, patch_size, stride=patch_size)
        n = (img_size[0] // patch_size[0]) * (img_size[1] // patch_size[1])
        if class_token:
            self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 1e-6)
            n += 1
        else:
            self.cls_token = None
        self.pos_embed = nn.Parameter(torch.randn(1, n, d) * 0.02)
        self.blocks = nn.ModuleList(TwinViTBlock(d, heads, mlp_ratio) for _ in range(depth))
        self.norm = nn.LayerNorm(d)

    def forward(self, x):  # x: (B, C, H, W)
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        if self.cls_token is not None:
            x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], dim=1)
        x = x + self.pos_embed
        for b in self.blocks:
            x = b(x)
        return self.norm(x)


class TwinViTSTR(nn.Module):
    """Reference ViTSTR twin: ViT with cls token + per-position head,
    flat state_dict keys (patch_embed.*, blocks.*, head.*)."""

    def __init__(self, num_tokens=97, max_label_length=25, img_size=(224, 224),
                 patch_size=(16, 16), d=384, heads=6, depth=12, mlp_ratio=4):
        super().__init__()
        self.max_label_length = max_label_length
        self._enc = TwinEncoder(img_size, patch_size, d, depth, heads, mlp_ratio, class_token=True)
        # expose flat keys like the reference's inner ViT
        self.patch_embed = self._enc.patch_embed
        self.register_parameter('cls_token', self._enc.cls_token)
        self.register_parameter('pos_embed', self._enc.pos_embed)
        self.blocks = self._enc.blocks
        self.norm = self._enc.norm
        self.head = nn.Linear(d, num_tokens - 2)

    def state_dict(self, *a, **k):
        sd = super().state_dict(*a, **k)
        return {key: v for key, v in sd.items() if not key.startswith('_enc.')}

    @torch.no_grad()
    def forward(self, images):
        x = self._enc(images)
        x = x[:, : self.max_label_length + 2]
        logits = self.head(x)
        return logits[:, 1:]  # drop class-token position (system.py:72-73)


class TwinBiLSTM(nn.Module):
    def __init__(self, input_size, hidden_size, output_size):
        super().__init__()
        self.rnn = nn.LSTM(input_size, hidden_size, bidirectional=True, batch_first=True)
        self.linear = nn.Linear(hidden_size * 2, output_size)

    def forward(self, x):
        return self.linear(self.rnn(x)[0])


class TwinCRNN(nn.Module):
    """Reference CRNN twin: 7-conv VGG stack -> 2x BiLSTM, matching keys."""

    def __init__(self, img_h=32, nc=3, nclass=37, nh=256, leaky_relu=False):
        super().__init__()
        ks = [3, 3, 3, 3, 3, 3, 2]
        ps = [1, 1, 1, 1, 1, 1, 0]
        nm = [64, 128, 256, 256, 512, 512, 512]
        bns = [False, False, True, False, True, False, True]
        cnn_seq = nn.Sequential()
        cin = nc
        for i in range(7):
            cnn_seq.add_module(f'conv{i}', nn.Conv2d(cin, nm[i], ks[i], 1, ps[i], bias=not bns[i]))
            if bns[i]:
                cnn_seq.add_module(f'batchnorm{i}', nn.BatchNorm2d(nm[i]))
            cnn_seq.add_module(f'relu{i}', nn.LeakyReLU(0.2) if leaky_relu else nn.ReLU())
            if i == 0:
                cnn_seq.add_module('pooling0', nn.MaxPool2d(2, 2))
            elif i == 1:
                cnn_seq.add_module('pooling1', nn.MaxPool2d(2, 2))
            elif i == 3:
                cnn_seq.add_module('pooling2', nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
            elif i == 5:
                cnn_seq.add_module('pooling3', nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
            cin = nm[i]
        self.cnn = cnn_seq
        self.rnn = nn.Sequential(TwinBiLSTM(512, nh, nh), TwinBiLSTM(nh, nh, nclass))

    @torch.no_grad()
    def forward(self, x):
        conv = self.cnn(x)
        b, c, h, w = conv.size()
        assert h == 1
        return self.rnn(conv.squeeze(2).transpose(1, 2))


class TwinBasicBlock(nn.Module):
    """torchvision BasicBlock-compatible (conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class TwinTRBA(nn.Module):
    """Reference TRBA twin with matching state_dict keys."""

    def __init__(self, num_class=97, img_size=(32, 128), F_fid=20, oc=512, nh=256,
                 max_label_length=25, use_ctc=False, num_char_embeddings=256):
        super().__init__()
        import numpy as np

        self.max_label_length = max_label_length
        self.use_ctc = use_ctc
        self.bos_id, self.eos_id, self.pad_id = num_class - 2, 0, num_class - 1
        self.nh = nh

        # --- TPS
        T = nn.Module()
        L = nn.Module()
        L.conv = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, 1, 1, bias=False), nn.BatchNorm2d(128), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(128, 256, 3, 1, 1, bias=False), nn.BatchNorm2d(256), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(256, 512, 3, 1, 1, bias=False), nn.BatchNorm2d(512), nn.ReLU(True), nn.AdaptiveAvgPool2d(1),
        )
        L.localization_fc1 = nn.Sequential(nn.Linear(512, 256), nn.ReLU(True))
        L.localization_fc2 = nn.Linear(256, F_fid * 2)
        L.localization_fc2.weight.data.fill_(0)
        x = np.linspace(-1.0, 1.0, F_fid // 2)
        init_bias = np.concatenate([
            np.stack([x, np.linspace(0.0, -1.0, F_fid // 2)], 1),
            np.stack([x, np.linspace(1.0, 0.0, F_fid // 2)], 1)], 0)
        L.localization_fc2.bias.data = torch.from_numpy(init_bias).float().view(-1)
        T.LocalizationNetwork = L
        self.Transformation = T
        self._F = F_fid
        self._img_size = img_size
        from parseq_tpu.models.trba import _build_C, _build_inv_delta_C, _build_P, _build_P_hat

        C = _build_C(F_fid)
        self._inv_delta_C = torch.from_numpy(_build_inv_delta_C(F_fid, C)).float()
        self._P_hat = torch.from_numpy(
            _build_P_hat(F_fid, C, _build_P(img_size[1], img_size[0]))).float()

        # --- FAN ResNet
        R = nn.Module()
        ocb = [oc // 4, oc // 2, oc, oc]
        R.conv0_1 = nn.Conv2d(3, oc // 16, 3, 1, 1, bias=False)
        R.bn0_1 = nn.BatchNorm2d(oc // 16)
        R.conv0_2 = nn.Conv2d(oc // 16, oc // 8, 3, 1, 1, bias=False)
        R.bn0_2 = nn.BatchNorm2d(oc // 8)
        R.layer1 = nn.Sequential(TwinBasicBlock(oc // 8, ocb[0]))
        R.conv1 = nn.Conv2d(ocb[0], ocb[0], 3, 1, 1, bias=False)
        R.bn1 = nn.BatchNorm2d(ocb[0])
        R.layer2 = nn.Sequential(TwinBasicBlock(ocb[0], ocb[1]), TwinBasicBlock(ocb[1], ocb[1]))
        R.conv2 = nn.Conv2d(ocb[1], ocb[1], 3, 1, 1, bias=False)
        R.bn2 = nn.BatchNorm2d(ocb[1])
        R.layer3 = nn.Sequential(TwinBasicBlock(ocb[1], ocb[2]),
                                 *[TwinBasicBlock(ocb[2], ocb[2]) for _ in range(4)])
        R.conv3 = nn.Conv2d(ocb[2], ocb[2], 3, 1, 1, bias=False)
        R.bn3 = nn.BatchNorm2d(ocb[2])
        R.layer4 = nn.Sequential(*[TwinBasicBlock(ocb[2] if i == 0 else ocb[3], ocb[3]) for i in range(3)])
        R.conv4_1 = nn.Conv2d(ocb[3], ocb[3], 2, (2, 1), (0, 1), bias=False)
        R.bn4_1 = nn.BatchNorm2d(ocb[3])
        R.conv4_2 = nn.Conv2d(ocb[3], ocb[3], 2, 1, 0, bias=False)
        R.bn4_2 = nn.BatchNorm2d(ocb[3])
        FE = nn.Module()
        FE.ConvNet = R
        self.FeatureExtraction = FE

        self.SequenceModeling = nn.Sequential(TwinBiLSTM(oc, nh, nh), TwinBiLSTM(nh, nh, nh))
        if use_ctc:
            self.Prediction = nn.Linear(nh, num_class)
        else:
            P = nn.Module()
            AC = nn.Module()
            AC.i2h = nn.Linear(nh, nh, bias=False)
            AC.h2h = nn.Linear(nh, nh)
            AC.score = nn.Linear(nh, 1, bias=False)
            AC.rnn = nn.LSTMCell(nh + num_char_embeddings, nh)
            P.attention_cell = AC
            P.generator = nn.Linear(nh, num_class)
            P.char_embeddings = nn.Embedding(num_class, num_char_embeddings)
            self.Prediction = P

    def _tps(self, images):
        B = images.shape[0]
        feat = self.Transformation.LocalizationNetwork.conv(images).view(B, -1)
        cp = self.Transformation.LocalizationNetwork.localization_fc2(
            self.Transformation.LocalizationNetwork.localization_fc1(feat)).view(B, self._F, 2)
        czeros = torch.cat([cp, cp.new_zeros(B, 3, 2)], dim=1)
        Tm = self._inv_delta_C.unsqueeze(0) @ czeros
        Pp = self._P_hat.unsqueeze(0) @ Tm
        grid = Pp.view(B, self._img_size[0], self._img_size[1], 2)
        return F.grid_sample(images, grid, padding_mode='border', align_corners=True)

    def _resnet(self, x):
        R = self.FeatureExtraction.ConvNet
        x = F.relu(R.bn0_1(R.conv0_1(x)))
        x = F.relu(R.bn0_2(R.conv0_2(x)))
        x = F.max_pool2d(x, 2, 2)
        x = R.layer1(x)
        x = F.relu(R.bn1(R.conv1(x)))
        x = F.max_pool2d(x, 2, 2)
        x = R.layer2(x)
        x = F.relu(R.bn2(R.conv2(x)))
        x = F.max_pool2d(x, (2, 2), (2, 1), (0, 1))
        x = R.layer3(x)
        x = F.relu(R.bn3(R.conv3(x)))
        x = R.layer4(x)
        x = F.relu(R.bn4_1(R.conv4_1(x)))
        x = F.relu(R.bn4_2(R.conv4_2(x)))
        return x

    @torch.no_grad()
    def forward(self, images, text=None):
        x = self._tps(images)
        v = self._resnet(x)  # (B, C, 1, W)
        v = v.permute(0, 3, 1, 2).squeeze(3)  # (B, W, C) since h == 1
        h = self.SequenceModeling(v)
        if self.use_ctc:
            return self.Prediction(h)
        P = self.Prediction
        B = h.shape[0]
        n = self.max_label_length + 1
        hid = (h.new_zeros(B, self.nh), h.new_zeros(B, self.nh))
        Hp = P.attention_cell.i2h(h)
        outs = []
        ids = torch.full((B,), self.bos_id, dtype=torch.long)
        for i in range(n):
            emb = P.char_embeddings(text[:, i] if text is not None else ids)
            e = P.attention_cell.score(torch.tanh(Hp + P.attention_cell.h2h(hid[0]).unsqueeze(1)))
            alpha = F.softmax(e, dim=1)
            ctxv = (alpha.transpose(1, 2) @ h).squeeze(1)
            hid = P.attention_cell.rnn(torch.cat([ctxv, emb], 1), hid)
            logit = P.generator(hid[0])
            outs.append(logit)
            ids = logit.argmax(-1)
        return torch.stack(outs, dim=1)


class _PE(nn.Module):
    def __init__(self, d, max_len, p=0.0):
        super().__init__()
        import numpy as np

        pos = np.arange(max_len)[:, None].astype(np.float64)
        div = np.exp(np.arange(0, d, 2) * (-math.log(10000.0) / d))
        pe = np.zeros((max_len, d))
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        self.register_buffer('pe', torch.from_numpy(pe).float().unsqueeze(1))

    def forward(self, x):  # (T, N, E)
        return x + self.pe[: x.size(0)]


class TwinR45Block(nn.Module):
    """ABINet resnet45 BasicBlock: 1x1 conv1, 3x3 conv2 (with stride)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 1, 1, 0, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class TwinResnet45(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        planes, blocks, strides = [32, 64, 128, 256, 512], [3, 4, 6, 6, 3], [2, 1, 2, 1, 1]
        cin = 32
        for li in range(5):
            mods = []
            for bi in range(blocks[li]):
                mods.append(TwinR45Block(cin if bi == 0 else planes[li], planes[li],
                                         strides[li] if bi == 0 else 1))
            setattr(self, f'layer{li + 1}', nn.Sequential(*mods))
            cin = planes[li]

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        for li in range(5):
            x = getattr(self, f'layer{li + 1}')(x)
        return x


class TwinBCNLayer(nn.Module):
    """Vendored decoder layer (abinet/transformer.py:64-154), no self-attn."""

    def __init__(self, d, nhead, dff, use_self_attn=False):
        super().__init__()
        self.use_self_attn = use_self_attn
        if use_self_attn:
            self.self_attn = nn.MultiheadAttention(d, nhead)
            self.norm1 = nn.LayerNorm(d)
        self.multihead_attn = nn.MultiheadAttention(d, nhead)
        self.linear1 = nn.Linear(d, dff)
        self.linear2 = nn.Linear(dff, d)
        self.norm2 = nn.LayerNorm(d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, memory, memory_mask, memory_kpm, tgt_kpm):
        if self.use_self_attn:
            a, _ = self.self_attn(tgt, tgt, tgt, key_padding_mask=tgt_kpm)
            tgt = self.norm1(tgt + a)
        a, _ = self.multihead_attn(tgt, memory, memory, attn_mask=memory_mask,
                                   key_padding_mask=memory_kpm)
        tgt = self.norm2(tgt + a)
        h = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + h)


class TwinABINet(nn.Module):
    """Reference ABINetIterModel twin, eval-mode, matching state_dict keys."""

    def __init__(self, num_classes=95, max_label_length=25, img_size=(32, 128),
                 d=512, nhead=8, dff=2048, v_layers=2, l_layers=4, iter_size=3):
        super().__init__()
        self.max_length = max_label_length + 1
        self.null_label = 0
        self.iter_size = iter_size
        self.d = d
        T = self.max_length
        HW = (img_size[0] // 4) * (img_size[1] // 4)

        V = nn.Module()
        B = nn.Module()
        B.resnet = TwinResnet45()
        B.pos_encoder = _PE(d, HW)
        enc_layer = nn.TransformerEncoderLayer(d, nhead, dff, dropout=0.0, activation='relu')
        B.transformer = nn.TransformerEncoder(enc_layer, v_layers)
        V.backbone = B
        A = nn.Module()
        A.k_encoder = nn.Sequential(
            nn.Sequential(nn.Conv2d(d, 64, 3, (1, 2), 1), nn.BatchNorm2d(64), nn.ReLU(True)),
            nn.Sequential(nn.Conv2d(64, 64, 3, (2, 2), 1), nn.BatchNorm2d(64), nn.ReLU(True)),
            nn.Sequential(nn.Conv2d(64, 64, 3, (2, 2), 1), nn.BatchNorm2d(64), nn.ReLU(True)),
            nn.Sequential(nn.Conv2d(64, 64, 3, (2, 2), 1), nn.BatchNorm2d(64), nn.ReLU(True)),
        )

        def dec(cin, cout, size=None, scale=None):
            return nn.Sequential(
                nn.Upsample(size=size, scale_factor=scale, mode='nearest'),
                nn.Conv2d(cin, cout, 3, 1, 1), nn.BatchNorm2d(cout), nn.ReLU(True))

        A.k_decoder = nn.Sequential(
            dec(64, 64, scale=2), dec(64, 64, scale=2), dec(64, 64, scale=2),
            dec(64, d, size=(img_size[0] // 4, img_size[1] // 4)))
        A.pos_encoder = _PE(d, T)
        A.project = nn.Linear(d, d)
        V.attention = A
        V.cls = nn.Linear(d, num_classes)
        self.vision = V

        L = nn.Module()
        L.proj = nn.Linear(num_classes, d, False)
        L.token_encoder = _PE(d, T)
        L.pos_encoder = _PE(d, T)
        M = nn.Module()
        M.layers = nn.ModuleList(TwinBCNLayer(d, nhead, dff) for _ in range(l_layers))
        L.model = M
        L.cls = nn.Linear(d, num_classes)
        self.language = L

        AL = nn.Module()
        AL.w_att = nn.Linear(2 * d, d)
        AL.cls = nn.Linear(d, num_classes)
        self.alignment = AL

    def _get_length(self, logit):
        out = logit.argmax(-1) == self.null_label
        abn = out.any(-1)
        idx = ((out.cumsum(-1) == 1) & out).max(-1)[1] + 1
        return torch.where(abn, idx, torch.full_like(idx, logit.shape[1]))

    def _vision(self, images):
        V = self.vision
        x = V.backbone.resnet(images)
        n, c, h, w = x.shape
        seq = x.view(n, c, -1).permute(2, 0, 1)
        seq = V.backbone.transformer(V.backbone.pos_encoder(seq))
        x = seq.permute(1, 2, 0).view(n, c, h, w)
        # position attention
        A = V.attention
        k = x
        feats = []
        for m in A.k_encoder:
            k = m(k)
            feats.append(k)
        for i in range(3):
            k = A.k_decoder[i](k)
            k = k + feats[2 - i]
        k = A.k_decoder[3](k)
        zeros = x.new_zeros((self.max_length, n, c))
        q = A.pos_encoder(zeros).permute(1, 0, 2)
        q = A.project(q)
        scores = torch.bmm(q, k.flatten(2, 3)) / (c ** 0.5)
        attn = torch.softmax(scores, dim=-1)
        v = x.permute(0, 2, 3, 1).view(n, -1, c)
        vecs = torch.bmm(attn, v)
        logits = V.cls(vecs)
        return {'feature': vecs, 'logits': logits, 'pt_lengths': self._get_length(logits)}

    def _language(self, tokens, lengths):
        L = self.language
        T = self.max_length
        embed = L.proj(tokens).permute(1, 0, 2)
        embed = L.token_encoder(embed)
        pad = torch.arange(T)[None, :] >= lengths[:, None]
        query = L.pos_encoder(embed.new_zeros(embed.shape))
        loc = torch.eye(T).float().masked_fill(torch.eye(T, dtype=torch.bool), float('-inf'))
        out = query
        for layer in L.model.layers:
            out = layer(out, embed, loc, pad, pad)
        out = out.permute(1, 0, 2)
        logits = L.cls(out)
        return {'feature': out, 'logits': logits, 'pt_lengths': self._get_length(logits)}

    def _align(self, lf, vf):
        f = torch.cat([lf, vf], dim=2)
        gate = torch.sigmoid(self.alignment.w_att(f))
        out = gate * vf + (1 - gate) * lf
        logits = self.alignment.cls(out)
        return {'logits': logits, 'pt_lengths': self._get_length(logits)}

    @torch.no_grad()
    def forward(self, images):
        v = self._vision(images)
        a = v
        for _ in range(self.iter_size):
            tokens = torch.softmax(a['logits'], dim=-1)
            lengths = a['pt_lengths'].clamp(2, self.max_length)
            l = self._language(tokens, lengths)
            a = self._align(l['feature'], v['feature'])
        return a, l, v


class TwinDecoderLayer(nn.Module):
    def __init__(self, d, heads, dff):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.cross_attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.linear1 = nn.Linear(d, dff)
        self.linear2 = nn.Linear(dff, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.norm_q = nn.LayerNorm(d)
        self.norm_c = nn.LayerNorm(d)

    def stream(self, tgt, tgt_norm, tgt_kv, memory, mask, kpm):
        x, _ = self.self_attn(tgt_norm, tgt_kv, tgt_kv, attn_mask=mask, key_padding_mask=kpm)
        tgt = tgt + x
        x, _ = self.cross_attn(self.norm1(tgt), memory, memory)
        tgt = tgt + x
        return tgt + self.linear2(F.gelu(self.linear1(self.norm2(tgt))))

    def forward(self, query, content, memory, qmask, cmask, kpm, update_content):
        qn, cn = self.norm_q(query), self.norm_c(content)
        query = self.stream(query, qn, cn, memory, qmask, kpm)
        if update_content:
            content = self.stream(content, cn, cn, memory, cmask, kpm)
        return query, content


class TwinDecoder(nn.Module):
    def __init__(self, d, heads, dff, depth):
        super().__init__()
        self.layers = nn.ModuleList(TwinDecoderLayer(d, heads, dff) for _ in range(depth))
        self.norm = nn.LayerNorm(d)

    def forward(self, query, content, memory, qmask=None, cmask=None, kpm=None):
        for i, layer in enumerate(self.layers):
            query, content = layer(query, content, memory, qmask, cmask, kpm,
                                   update_content=i < len(self.layers) - 1)
        return self.norm(query)


class TwinPARSeq(nn.Module):
    """State-dict-compatible with the reference inner PARSeq model."""

    def __init__(self, num_tokens=97, max_label_length=25, img_size=(32, 128),
                 patch_size=(4, 8), d=384, enc_heads=6, enc_mlp=4, enc_depth=12,
                 dec_heads=12, dec_mlp=4, dec_depth=1):
        super().__init__()
        self.max_label_length = max_label_length
        self.d = d
        self.eos_id, self.bos_id, self.pad_id = 0, num_tokens - 2, num_tokens - 1
        self.encoder = TwinEncoder(img_size, patch_size, d, enc_depth, enc_heads, enc_mlp)
        self.decoder = TwinDecoder(d, dec_heads, d * dec_mlp, dec_depth)
        self.head = nn.Linear(d, num_tokens - 2)
        self.text_embed = nn.Module()
        self.text_embed.embedding = nn.Embedding(num_tokens, d)
        self.pos_queries = nn.Parameter(torch.randn(1, max_label_length + 1, d) * 0.02)

    def embed_text(self, ids):
        return math.sqrt(self.d) * self.text_embed.embedding(ids)

    def decode(self, tgt, memory, tgt_mask=None, tgt_padding_mask=None, tgt_query=None, tgt_query_mask=None):
        N, L = tgt.shape
        null_ctx = self.embed_text(tgt[:, :1])
        ctx = self.pos_queries[:, : L - 1] + self.embed_text(tgt[:, 1:])
        ctx = torch.cat([null_ctx, ctx], dim=1)
        if tgt_query is None:
            tgt_query = self.pos_queries[:, :L].expand(N, -1, -1)
        return self.decoder(tgt_query, ctx, memory, tgt_query_mask, tgt_mask, tgt_padding_mask)

    @torch.no_grad()
    def forward(self, images, decode_ar=True, refine_iters=1):
        """Reference inference semantics (model.py:105-169), no early exit."""
        bs = images.shape[0]
        n = self.max_label_length + 1
        memory = self.encoder(images)
        pos_q = self.pos_queries[:, :n].expand(bs, -1, -1)
        tgt_mask = query_mask = torch.triu(torch.ones((n, n), dtype=torch.bool), 1)

        if decode_ar:
            tgt_in = torch.full((bs, n), self.pad_id, dtype=torch.long)
            tgt_in[:, 0] = self.bos_id
            logits = []
            for i in range(n):
                j = i + 1
                out = self.decode(tgt_in[:, :j], memory, tgt_mask[:j, :j],
                                  tgt_query=pos_q[:, i:j], tgt_query_mask=query_mask[i:j, :j])
                p_i = self.head(out)
                logits.append(p_i)
                if j < n:
                    tgt_in[:, j] = p_i.squeeze(1).argmax(-1)
            logits = torch.cat(logits, dim=1)
        else:
            tgt_in = torch.full((bs, 1), self.bos_id, dtype=torch.long)
            logits = self.head(self.decode(tgt_in, memory, tgt_query=pos_q))

        if refine_iters:
            query_mask[torch.triu(torch.ones(n, n, dtype=torch.bool), 2)] = 0
            bos = torch.full((bs, 1), self.bos_id, dtype=torch.long)
            for _ in range(refine_iters):
                tgt_in = torch.cat([bos, logits[:, :-1].argmax(-1)], dim=1)
                padding_mask = (tgt_in == self.eos_id).int().cumsum(-1) > 0
                out = self.decode(tgt_in, memory, tgt_mask, padding_mask, pos_q,
                                  query_mask[:, : tgt_in.shape[1]])
                logits = self.head(out)
        return logits


class TwinSVAttention(nn.Module):
    """ABINet 'attention' variant (abinet/attention.py:7-32)."""

    def __init__(self, in_channels=512, max_length=26, n_feature=256):
        super().__init__()
        self.max_length = max_length
        self.f0_embedding = nn.Embedding(max_length, in_channels)
        self.w0 = nn.Linear(max_length, n_feature)
        self.wv = nn.Linear(in_channels, in_channels)
        self.we = nn.Linear(in_channels, max_length)

    @torch.no_grad()
    def forward(self, enc_output):  # (B, E, H, W)
        enc_output = enc_output.permute(0, 2, 3, 1).flatten(1, 2)
        order = torch.arange(self.max_length).unsqueeze(0).expand(enc_output.size(0), -1)
        emb = self.f0_embedding(order)
        t = self.w0(emb.permute(0, 2, 1))
        t = torch.tanh(t.permute(0, 2, 1) + self.wv(enc_output))
        attn = torch.softmax(self.we(t).permute(0, 2, 1), dim=2)
        return torch.bmm(attn, enc_output)
