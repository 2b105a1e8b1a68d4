from .easydict import EasyDict
