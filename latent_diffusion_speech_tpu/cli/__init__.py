"""Pipeline CLI (L9) — the numbered-script surface of the reference, as
`python -m latent_diffusion_speech_tpu.cli.<stage>` entry points:

| reference script                | module                  |
|--------------------------------|-------------------------|
| 00_del_audio_over_30s.py       | prepare_audio --max-sec |
| 01_rename_to_increasing_number | prepare_audio --renumber|
| 02_randomly_extract_valset.py  | prepare_audio --valset  |
| 10_preprocess_train_unit.py    | preprocess_unit         |
| 11_preprocess_train_mel.py     | preprocess_mel          |
| 15_preprocess_train_text.py    | preprocess_text         |
| 16_preprocess_train_tts.py     | preprocess_tts          |
| 17_preprocess_train_cluster.py | preprocess_cluster      |
| 18_preprocess_val.py           | preprocess_val          |
| 19_preprocess_token.py         | preprocess_token        |
| 20_train_diffusion.py          | train_diffusion         |
| 21_train_lm.py                 | train_lm                |
| 22_infer_tts.py                | infer_tts               |

The on-disk data contract (units/ mel/ aug_mel/ utt/ semantic_token/ npy
layout) is identical to the reference so datasets interoperate.
"""
