from .preprocess import PreProcessor, PostProcessor, PreprocessMeta
from .quantization import (QuantizationConfig, quantize_model, quantize_bf16,
                           quantize_int8, dequantize_int8,
                           quantization_report, quantization_error)
from .serving import (ServingConfig, ServingPipeline, make_sample_fn,
                      enable_compilation_cache,
                      export_stablehlo, load_stablehlo,
                      create_serving_package, load_serving_package)
from .quantization import calibrate_activations, benchmark_quantized_model
from .qat import fake_quant_params, fake_quant_tensor, make_qat_train_step
