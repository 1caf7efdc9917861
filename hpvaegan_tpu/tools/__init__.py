from .convert import (load_intermediate, p2j_HPVAEGAN, p2j_WDiscriminator,
                      load_torch_checkpoint)
