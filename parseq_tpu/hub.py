"""Model factory API (reference hubconf.py:6-66 equivalent).

Each factory composes the experiment config and returns a ModelBundle.
`pretrained` accepts a local path to either a reference PyTorch .pt file
(converted on the fly) or a native checkpoint — this environment has no
network, so URLs are not fetched.

    from parseq_tpu import hub
    model = hub.parseq(pretrained='weights/parseq-bb5792a6.pt')
"""

from __future__ import annotations

from parseq_tpu.utils.registry import ModelBundle, create_model, load_from_checkpoint


def _factory(experiment):
    def fn(pretrained: str | bool | None = None, **kwargs) -> ModelBundle:
        if pretrained is True:
            # torch.hub semantics: resolve the released weights from the
            # checksum cache (downloading when the env has network).
            from parseq_tpu.utils.pretrained import load_pretrained

            return load_pretrained(experiment, **kwargs)
        if pretrained:
            return load_from_checkpoint(pretrained, **kwargs)
        return create_model(experiment, **kwargs)

    fn.__name__ = experiment.replace('-', '_')
    fn.__doc__ = f'Build {experiment} (optionally from a local checkpoint path).'
    return fn


parseq = _factory('parseq')
parseq_tiny = _factory('parseq-tiny')
parseq_patch16_224 = _factory('parseq-patch16-224')
vitstr = _factory('vitstr')
crnn = _factory('crnn')
trba = _factory('trba')
abinet = _factory('abinet')
