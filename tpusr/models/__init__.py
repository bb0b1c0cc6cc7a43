from tpusr.models.srcnn import SRCNN
from tpusr.models.edsr import EDSR
from tpusr.models.esrgan import ESRGANGenerator, ESRGANDiscriminator
from tpusr.models.vgg import VGG16Classifier, VGG19Features, preprocess_caffe
from tpusr.models.layers import SelfAttention, SNConv, SNDense, pixel_shuffle
