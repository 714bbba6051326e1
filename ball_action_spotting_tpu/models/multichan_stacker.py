"""MultiChanStacker — multi-channel (e.g. RGB) variant of MultiDimStacker.

Parity reference: ``/root/reference/src/models/multichan_stacker.py``.
Each stack contributes ``stack_size * num_chans`` channels to the shared 2D
encoder; the rest of the network is unchanged. Input is
(B, T, num_chans, H, W).
"""

from __future__ import annotations

import jax

from ball_action_spotting_tpu.models.multidim_stacker import MultiDimStacker


class MultiChanStacker(MultiDimStacker):
    num_chans: int = 3

    def encoder_in_chans(self) -> int:
        return self.stack_size * self.num_chans

    def forward_2d(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, t, c, h, w = x.shape
        assert t % self.stack_size == 0 and c == self.num_chans
        num_stacks = t // self.stack_size
        x = x.astype(self.dtype)
        # (B*S, H, W, stack_size*num_chans), channel order (frame, chan) —
        # matching the reference's view(b*S, stack*chans, h, w)
        x = x.reshape(b * num_stacks, self.stack_size * self.num_chans, h, w)
        x = x.transpose(0, 2, 3, 1)
        x = self.conv2d_encoder(x, train=train)
        x = self.conv2d_projection_conv(x)
        x = self.conv2d_projection_bn(x, train=train)
        _, fh, fw, fc = x.shape
        return x.reshape(b, num_stacks, fh, fw, fc)
