from m2trans_tpu.losses.pixel import l1_loss, charbonnier_loss  # noqa: F401
