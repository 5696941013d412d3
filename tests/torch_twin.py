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
