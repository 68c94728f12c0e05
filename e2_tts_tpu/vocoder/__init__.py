from e2_tts_tpu.vocoder.vocos import Vocos, VocosBackbone, ISTFTHead, istft

__all__ = ['Vocos', 'VocosBackbone', 'ISTFTHead', 'istft']
