from .modal_model import ModalSoundModel, load_model
