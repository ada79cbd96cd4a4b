// boost::shared_ptr -> std::shared_ptr for the extraction build.
#pragma once
#include <memory>
namespace boost { using std::shared_ptr; }
