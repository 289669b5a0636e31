module @_allpairs_kernel attributes {stable_mosaic.version = 8 : i64} {
  "stable_mosaic.func.func"() ({
  ^bb0(%arg0: i32, %arg1: i32, %arg2: memref<512x3xf32, #tpu.memory_space<vmem>>, %arg3: memref<3x2048xf32, #tpu.memory_space<vmem>>, %arg4: memref<1x2048xf32, #tpu.memory_space<vmem>>, %arg5: memref<512x3xf32, #tpu.memory_space<vmem>>):
    %0 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %1 = "stable_mosaic.arith.cmpi"(%arg1, %0) {predicate = 0 : i64} : (i32, i32) -> i1
    %2 = "stable_mosaic.arith.extui"(%1) : (i1) -> i32
    %3 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %4 = "stable_mosaic.arith.cmpi"(%2, %3) {predicate = 1 : i64} : (i32, i32) -> i1
    "stable_mosaic.scf.if"(%4) ({
      %103 = "stable_mosaic.arith.constant"() {value = 0.000000e+00 : f32} : () -> f32
      %104 = "stable_mosaic.vector.broadcast"(%103) : (f32) -> vector<512x3xf32>
      %105 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %106 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %107 = "stable_mosaic.vector.load"(%arg5, %105, %106) : (memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> vector<512x3xf32>
      "stable_mosaic.tpu.vector_store"(%104, %arg5, %105, %106) {add = false, operandSegmentSizes = array<i32: 1, 1, 2, 0>, strides = array<i32>} : (vector<512x3xf32>, memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> ()
      "stable_mosaic.scf.yield"() : () -> ()
    }, {
      "stable_mosaic.scf.yield"() : () -> ()
    }) : (i1) -> ()
    %5 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %6 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %7 = "stable_mosaic.vector.load"(%arg2, %5, %6) : (memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> vector<512x3xf32>
    %8 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %9 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %10 = "stable_mosaic.vector.load"(%arg3, %8, %9) : (memref<3x2048xf32, #tpu.memory_space<vmem>>, index, index) -> vector<1x2048xf32>
    %11 = "stable_mosaic.vector.shape_cast"(%10) : (vector<1x2048xf32>) -> vector<2048xf32>
    %12 = "stable_mosaic.vector.shape_cast"(%11) : (vector<2048xf32>) -> vector<1x2048xf32>
    %13 = "stable_mosaic.vector.extract_strided_slice"(%7) {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : (vector<512x3xf32>) -> vector<512x1xf32>
    %14 = "stable_mosaic.vector.shape_cast"(%13) : (vector<512x1xf32>) -> vector<512xf32>
    %15 = "stable_mosaic.vector.shape_cast"(%14) : (vector<512xf32>) -> vector<512x1xf32>
    %16 = "stable_mosaic.vector.broadcast"(%12) : (vector<1x2048xf32>) -> vector<512x2048xf32>
    %17 = "stable_mosaic.vector.broadcast"(%15) : (vector<512x1xf32>) -> vector<512x2048xf32>
    %18 = "stable_mosaic.arith.subf"(%16, %17) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %19 = "stable_mosaic.arith.mulf"(%18, %18) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %20 = "stable_mosaic.arith.constant"() {value = 1 : index} : () -> index
    %21 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %22 = "stable_mosaic.vector.load"(%arg3, %20, %21) : (memref<3x2048xf32, #tpu.memory_space<vmem>>, index, index) -> vector<1x2048xf32>
    %23 = "stable_mosaic.vector.shape_cast"(%22) : (vector<1x2048xf32>) -> vector<2048xf32>
    %24 = "stable_mosaic.vector.shape_cast"(%23) : (vector<2048xf32>) -> vector<1x2048xf32>
    %25 = "stable_mosaic.vector.extract_strided_slice"(%7) {offsets = [0, 1], sizes = [512, 1], strides = [1, 1]} : (vector<512x3xf32>) -> vector<512x1xf32>
    %26 = "stable_mosaic.vector.shape_cast"(%25) : (vector<512x1xf32>) -> vector<512xf32>
    %27 = "stable_mosaic.vector.shape_cast"(%26) : (vector<512xf32>) -> vector<512x1xf32>
    %28 = "stable_mosaic.vector.broadcast"(%24) : (vector<1x2048xf32>) -> vector<512x2048xf32>
    %29 = "stable_mosaic.vector.broadcast"(%27) : (vector<512x1xf32>) -> vector<512x2048xf32>
    %30 = "stable_mosaic.arith.subf"(%28, %29) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %31 = "stable_mosaic.arith.mulf"(%30, %30) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %32 = "stable_mosaic.arith.addf"(%19, %31) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %33 = "stable_mosaic.arith.constant"() {value = 2 : index} : () -> index
    %34 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %35 = "stable_mosaic.vector.load"(%arg3, %33, %34) : (memref<3x2048xf32, #tpu.memory_space<vmem>>, index, index) -> vector<1x2048xf32>
    %36 = "stable_mosaic.vector.shape_cast"(%35) : (vector<1x2048xf32>) -> vector<2048xf32>
    %37 = "stable_mosaic.vector.shape_cast"(%36) : (vector<2048xf32>) -> vector<1x2048xf32>
    %38 = "stable_mosaic.vector.extract_strided_slice"(%7) {offsets = [0, 2], sizes = [512, 1], strides = [1, 1]} : (vector<512x3xf32>) -> vector<512x1xf32>
    %39 = "stable_mosaic.vector.shape_cast"(%38) : (vector<512x1xf32>) -> vector<512xf32>
    %40 = "stable_mosaic.vector.shape_cast"(%39) : (vector<512xf32>) -> vector<512x1xf32>
    %41 = "stable_mosaic.vector.broadcast"(%37) : (vector<1x2048xf32>) -> vector<512x2048xf32>
    %42 = "stable_mosaic.vector.broadcast"(%40) : (vector<512x1xf32>) -> vector<512x2048xf32>
    %43 = "stable_mosaic.arith.subf"(%41, %42) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %44 = "stable_mosaic.arith.mulf"(%43, %43) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %45 = "stable_mosaic.arith.addf"(%32, %44) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %46 = "stable_mosaic.math.sqrt"(%45) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>) -> vector<512x2048xf32>
    %47 = "stable_mosaic.arith.mulf"(%45, %46) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %48 = "stable_mosaic.arith.constant"() {value = 1.1920929E-7 : f32} : () -> f32
    %49 = "stable_mosaic.vector.broadcast"(%48) : (f32) -> vector<512x2048xf32>
    %50 = "stable_mosaic.arith.addf"(%47, %49) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %51 = "stable_mosaic.tpu.reciprocal"(%50) {approx = true} : (vector<512x2048xf32>) -> vector<512x2048xf32>
    %52 = "stable_mosaic.arith.mulf"(%50, %51) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %53 = "stable_mosaic.arith.constant"() {value = 2.000000e+00 : f32} : () -> f32
    %54 = "stable_mosaic.vector.broadcast"(%53) : (f32) -> vector<512x2048xf32>
    %55 = "stable_mosaic.arith.subf"(%54, %52) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %56 = "stable_mosaic.arith.mulf"(%51, %55) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %57 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %58 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %59 = "stable_mosaic.vector.load"(%arg4, %57, %58) : (memref<1x2048xf32, #tpu.memory_space<vmem>>, index, index) -> vector<1x2048xf32>
    %60 = "stable_mosaic.vector.shape_cast"(%59) : (vector<1x2048xf32>) -> vector<2048xf32>
    %61 = "stable_mosaic.vector.shape_cast"(%60) : (vector<2048xf32>) -> vector<1x2048xf32>
    %62 = "stable_mosaic.vector.broadcast"(%61) : (vector<1x2048xf32>) -> vector<512x2048xf32>
    %63 = "stable_mosaic.arith.mulf"(%62, %56) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %64 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %65 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %66 = "stable_mosaic.vector.load"(%arg5, %64, %65) : (memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> vector<512x1xf32>
    %67 = "stable_mosaic.vector.shape_cast"(%66) : (vector<512x1xf32>) -> vector<512xf32>
    %68 = "stable_mosaic.arith.mulf"(%63, %18) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %69 = "stable_mosaic.arith.constant"() {value = dense<0.000000e+00> : vector<512xf32>} : () -> vector<512xf32>
    %70 = "stable_mosaic.vector.multi_reduction"(%68, %69) {kind = #vector.kind<add>, reduction_dims = array<i64: 1>} : (vector<512x2048xf32>, vector<512xf32>) -> vector<512xf32>
    %71 = "stable_mosaic.arith.addf"(%67, %70) {fastmath = #arith.fastmath<none>} : (vector<512xf32>, vector<512xf32>) -> vector<512xf32>
    %72 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %73 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %74 = "stable_mosaic.vector.load"(%arg5, %72, %73) : (memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> vector<512x1xf32>
    %75 = "stable_mosaic.vector.shape_cast"(%74) : (vector<512x1xf32>) -> vector<512xf32>
    %76 = "stable_mosaic.vector.shape_cast"(%71) : (vector<512xf32>) -> vector<512x1xf32>
    "stable_mosaic.tpu.vector_store"(%76, %arg5, %72, %73) {add = false, operandSegmentSizes = array<i32: 1, 1, 2, 0>, strides = array<i32>} : (vector<512x1xf32>, memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> ()
    %77 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %78 = "stable_mosaic.arith.constant"() {value = 1 : index} : () -> index
    %79 = "stable_mosaic.vector.load"(%arg5, %77, %78) : (memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> vector<512x1xf32>
    %80 = "stable_mosaic.vector.shape_cast"(%79) : (vector<512x1xf32>) -> vector<512xf32>
    %81 = "stable_mosaic.arith.mulf"(%63, %30) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %82 = "stable_mosaic.arith.constant"() {value = dense<0.000000e+00> : vector<512xf32>} : () -> vector<512xf32>
    %83 = "stable_mosaic.vector.multi_reduction"(%81, %82) {kind = #vector.kind<add>, reduction_dims = array<i64: 1>} : (vector<512x2048xf32>, vector<512xf32>) -> vector<512xf32>
    %84 = "stable_mosaic.arith.addf"(%80, %83) {fastmath = #arith.fastmath<none>} : (vector<512xf32>, vector<512xf32>) -> vector<512xf32>
    %85 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %86 = "stable_mosaic.arith.constant"() {value = 1 : index} : () -> index
    %87 = "stable_mosaic.vector.load"(%arg5, %85, %86) : (memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> vector<512x1xf32>
    %88 = "stable_mosaic.vector.shape_cast"(%87) : (vector<512x1xf32>) -> vector<512xf32>
    %89 = "stable_mosaic.vector.shape_cast"(%84) : (vector<512xf32>) -> vector<512x1xf32>
    "stable_mosaic.tpu.vector_store"(%89, %arg5, %85, %86) {add = false, operandSegmentSizes = array<i32: 1, 1, 2, 0>, strides = array<i32>} : (vector<512x1xf32>, memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> ()
    %90 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %91 = "stable_mosaic.arith.constant"() {value = 2 : index} : () -> index
    %92 = "stable_mosaic.vector.load"(%arg5, %90, %91) : (memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> vector<512x1xf32>
    %93 = "stable_mosaic.vector.shape_cast"(%92) : (vector<512x1xf32>) -> vector<512xf32>
    %94 = "stable_mosaic.arith.mulf"(%63, %43) {fastmath = #arith.fastmath<none>} : (vector<512x2048xf32>, vector<512x2048xf32>) -> vector<512x2048xf32>
    %95 = "stable_mosaic.arith.constant"() {value = dense<0.000000e+00> : vector<512xf32>} : () -> vector<512xf32>
    %96 = "stable_mosaic.vector.multi_reduction"(%94, %95) {kind = #vector.kind<add>, reduction_dims = array<i64: 1>} : (vector<512x2048xf32>, vector<512xf32>) -> vector<512xf32>
    %97 = "stable_mosaic.arith.addf"(%93, %96) {fastmath = #arith.fastmath<none>} : (vector<512xf32>, vector<512xf32>) -> vector<512xf32>
    %98 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
    %99 = "stable_mosaic.arith.constant"() {value = 2 : index} : () -> index
    %100 = "stable_mosaic.vector.load"(%arg5, %98, %99) : (memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> vector<512x1xf32>
    %101 = "stable_mosaic.vector.shape_cast"(%100) : (vector<512x1xf32>) -> vector<512xf32>
    %102 = "stable_mosaic.vector.shape_cast"(%97) : (vector<512xf32>) -> vector<512x1xf32>
    "stable_mosaic.tpu.vector_store"(%102, %arg5, %98, %99) {add = false, operandSegmentSizes = array<i32: 1, 1, 2, 0>, strides = array<i32>} : (vector<512x1xf32>, memref<512x3xf32, #tpu.memory_space<vmem>>, index, index) -> ()
    "stable_mosaic.func.return"() : () -> ()
  }) {dimension_semantics = [#tpu.dimension_semantics<arbitrary>, #tpu.dimension_semantics<arbitrary>], function_type = (i32, i32, memref<512x3xf32, #tpu.memory_space<vmem>>, memref<3x2048xf32, #tpu.memory_space<vmem>>, memref<1x2048xf32, #tpu.memory_space<vmem>>, memref<512x3xf32, #tpu.memory_space<vmem>>) -> (), iteration_bounds = array<i64: 2048, 512>, scalar_prefetch = 0 : i64, scratch_operands = 0 : i64, sym_name = "main", window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 512, 3>}, {transform_indices = @transform_1, window_bounds = array<i64: 3, 2048>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 2048>}, {transform_indices = @transform_3, window_bounds = array<i64: 512, 3>}]} : () -> ()
  "stable_mosaic.func.func"() ({
  ^bb0(%arg0: i32, %arg1: i32):
    %0 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %1 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    "stable_mosaic.func.return"(%arg0, %0) : (i32, i32) -> ()
  }) {function_type = (i32, i32) -> (i32, i32), sym_name = "transform_0"} : () -> ()
  "stable_mosaic.func.func"() ({
  ^bb0(%arg0: i32, %arg1: i32):
    %0 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %1 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    "stable_mosaic.func.return"(%0, %arg1) : (i32, i32) -> ()
  }) {function_type = (i32, i32) -> (i32, i32), sym_name = "transform_1"} : () -> ()
  "stable_mosaic.func.func"() ({
  ^bb0(%arg0: i32, %arg1: i32):
    %0 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %1 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    "stable_mosaic.func.return"(%0, %arg1) : (i32, i32) -> ()
  }) {function_type = (i32, i32) -> (i32, i32), sym_name = "transform_2"} : () -> ()
  "stable_mosaic.func.func"() ({
  ^bb0(%arg0: i32, %arg1: i32):
    %0 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %1 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    "stable_mosaic.func.return"(%arg0, %0) : (i32, i32) -> ()
  }) {function_type = (i32, i32) -> (i32, i32), sym_name = "transform_3"} : () -> ()
}
