// swift-tools-version:5.9
// Swift package over the tapecraft C ABI: CTapecraft is a system-library
// target for libtapecraft.so + tapecraft.h; Tapecraft is the Swift surface.
import PackageDescription

let package = Package(
    name: "Tapecraft",
    products: [.library(name: "Tapecraft", targets: ["Tapecraft"])],
    targets: [
        .systemLibrary(name: "CTapecraft", path: "Sources/CTapecraft"),
        .target(name: "Tapecraft", dependencies: ["CTapecraft"]),
    ]
)
